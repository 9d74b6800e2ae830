#!/usr/bin/env python
"""ATF training entry point (reference ``methods/ATF/ATF_train.py``):
asymmetric tri-way training with an ancillary backbone branch."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_train_parser  # noqa: E402
from da_runner import run_da_training  # noqa: E402

from tllod_tpu.methods.atf import ATFModel, atf_loss  # noqa: E402


def main():
    args = build_train_parser("Train an ATF network (TPU)").parse_args()
    run_da_training(
        "atf", ATFModel,
        lambda a: (lambda out: atf_loss(out, a.lamda)), args,
        extra_backbone_subtrees=(("backbone_anc",),))


if __name__ == "__main__":
    main()
