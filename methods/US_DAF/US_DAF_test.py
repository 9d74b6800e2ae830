#!/usr/bin/env python
"""US-DAF evaluation (reference ``methods/US_DAF/US_DAF_test.py``): vanilla
detector on the target (clipart) split; mAP over the 10 common classes is the
published metric."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_test_parser  # noqa: E402
from da_runner import run_da_eval  # noqa: E402

def main():
    parser = build_test_parser("Evaluate a US-DAF network (TPU)")
    parser.set_defaults(net="res101", dataset="voc_clipart")
    args = parser.parse_args()
    run_da_eval(args)

if __name__ == "__main__":
    main()
