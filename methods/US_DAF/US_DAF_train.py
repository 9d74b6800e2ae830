#!/usr/bin/env python
"""US-DAF training entry point (reference ``methods/US_DAF/US_DAF_train.py``):
universal DA with scale-aware margin-filtered instance alignment
(VOC -> Clipart, ResNet101 by default)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_train_parser  # noqa: E402
from da_runner import run_da_training  # noqa: E402
from tllod_tpu.methods.us_daf import USDAFModel, us_daf_loss  # noqa: E402

def main():
    parser = build_train_parser("Train a US-DAF network (TPU)")
    parser.set_defaults(net="res101", dataset="voc_clipart")
    args = parser.parse_args()
    run_da_training(
        "us_daf", USDAFModel,
        lambda a: (lambda out: us_daf_loss(out, a.lamda)), args)

if __name__ == "__main__":
    main()
