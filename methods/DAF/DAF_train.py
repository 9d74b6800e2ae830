#!/usr/bin/env python
"""DAF training entry point (reference ``methods/DAF/DAF_train.py``).

Same CLI surface; TPU-native execution: one jitted step runs the source
forward, target forward, all six DA losses, backward, and the SGD update.
``--mGPUs`` shards the batch over every chip in the mesh.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import build_train_parser  # noqa: E402
from da_runner import run_da_training  # noqa: E402

from tllod_tpu.methods.daf import DAFModel, daf_loss  # noqa: E402


def main():
    args = build_train_parser("Train a DAF network (TPU)").parse_args()
    run_da_training(
        "daf", DAFModel,
        lambda a: (lambda out: daf_loss(out, a.lamda)), args)


if __name__ == "__main__":
    main()
