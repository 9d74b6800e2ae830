#!/usr/bin/env python
"""PA-ATF evaluation (reference ``methods/PA_ATF/PA_ATF_test.py``)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_test_parser  # noqa: E402
from da_runner import run_da_eval  # noqa: E402

def main():
    args = build_test_parser("Evaluate a PA-ATF network (TPU)").parse_args()
    run_da_eval(args)

if __name__ == "__main__":
    main()
