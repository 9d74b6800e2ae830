#!/usr/bin/env python
"""MAD evaluation (reference ``methods/MAD/MAD_test.py``): vanilla detector
on the held-out (e.g. Foggy) split; DGOD tests on the unseen domain."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_test_parser  # noqa: E402
from da_runner import run_da_eval  # noqa: E402

def main():
    args = build_test_parser("Evaluate a MAD network (TPU)").parse_args()
    run_da_eval(args)

if __name__ == "__main__":
    main()
