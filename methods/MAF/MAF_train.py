#!/usr/bin/env python
"""MAF training entry point (reference ``methods/MAF/MAF_train.py``):
hierarchical multi-level image DA (SRM) + confidence-weighted instance DA."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_train_parser  # noqa: E402
from da_runner import run_da_training  # noqa: E402

from tllod_tpu.methods.maf import MAFModel, maf_loss  # noqa: E402


def main():
    parser = build_train_parser("Train a MAF network (TPU)")
    parser.add_argument("--alpha", default=1.0, type=float,
                        help="ins_DA loss param (reference MAF_train.py:108)")
    args = parser.parse_args()
    run_da_training(
        "maf", MAFModel,
        lambda a: (lambda out: maf_loss(out, a.lamda, a.alpha)), args)


if __name__ == "__main__":
    main()
