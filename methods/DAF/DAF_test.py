#!/usr/bin/env python
"""DAF evaluation entry point (reference ``methods/DAF/DAF_test.py``).

Loads a DAF checkpoint, restores ONLY the detector subtree into the vanilla
Faster R-CNN (the reference's filtered state_dict load, ``DAF_test.py:194``),
and reports per-class AP / mAP on the chosen split.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_test_parser  # noqa: E402
from da_runner import run_da_eval  # noqa: E402


def main():
    args = build_test_parser("Evaluate a DAF network (TPU)").parse_args()
    run_da_eval(args)


if __name__ == "__main__":
    main()
