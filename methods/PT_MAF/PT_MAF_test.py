#!/usr/bin/env python
"""PT-MAF evaluation (reference ``methods/PT_MAF/PT_MAF_test.py``): vanilla
detector with the PT-MAF checkpoint's detector subtree."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_test_parser  # noqa: E402
from da_runner import run_da_eval  # noqa: E402

def main():
    args = build_test_parser("Evaluate a PT-MAF network (TPU)").parse_args()
    run_da_eval(args)

if __name__ == "__main__":
    main()
