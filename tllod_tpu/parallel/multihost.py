"""Multi-host (multi-process) evaluation sharding.

The reference has no multi-host story at all (its only "communication" is
the in-GPU CUDA NMS, ``lib/model/nms/src/nms_cuda_kernel.cu:95-154``); this
is the TPU-native scale-out: under ``jax.distributed`` each process

  1. takes a strided slice of the roidb (:func:`shard_roidb`),
  2. runs detection on its own addressable devices only,
  3. allgathers the pickled per-image detections over the JAX runtime
     (:func:`allgather_bytes` — works without a shared filesystem, which
     TPU-pod worker VMs do not have),
  4. merges into the global ``all_boxes`` (:func:`merge_detections`) so
     every process can compute the same mAP.

The slicing/merge logic is pure and unit-tested on one process
(tests/test_multihost_eval.py); the collective is exercised by the
2-process CPU smoke test when the runtime provides a distributed backend.
"""

from __future__ import annotations

import pickle
from typing import List, Sequence, Tuple


def shard_roidb(roidb: Sequence, process_index: int,
                process_count: int) -> Tuple[list, List[int]]:
    """Strided per-process slice: process p takes images p, p+P, p+2P, ...

    Striding (not contiguous blocks) balances the aspect-ratio-grouped
    shape buckets across processes, so every process compiles the same
    bucket set instead of one process eating all portrait images.
    Returns (local_roidb, global_indices).
    """
    idx = list(range(process_index, len(roidb), process_count))
    return [roidb[i] for i in idx], idx


def allgather_bytes(payload: bytes) -> List[bytes]:
    """Gather one bytes blob from every process, returned in process order.

    Pads to the max length and rides two ``process_allgather`` collectives
    (sizes, then payloads) over the global device mesh — no shared
    filesystem or extra transport needed.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([arr.size], np.int64))                  # (P, 1)
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[:arr.size] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [gathered[p, :int(sizes[p])].tobytes()
            for p in range(sizes.shape[0])]


def pack_detections(indices: Sequence[int], all_boxes_local: list,
                    num_classes: int) -> bytes:
    """Pickle this process's detections as [(global_idx, [per-class
    arrays])] — only the rows this process actually produced."""
    rows = []
    for row, i in enumerate(indices):
        rows.append((i, [all_boxes_local[c][row]
                         for c in range(num_classes)]))
    return pickle.dumps(rows, protocol=pickle.HIGHEST_PROTOCOL)


def merge_detections(parts: Sequence[bytes], num_classes: int,
                     n_images: int) -> list:
    """Inverse of :func:`pack_detections` over all processes' blobs →
    global ``all_boxes[class][image]``."""
    all_boxes = [[[] for _ in range(n_images)] for _ in range(num_classes)]
    seen = set()
    for blob in parts:
        for i, per_class in pickle.loads(blob):
            if i in seen:
                raise ValueError(f"image {i} produced by two processes "
                                 "(roidb sharding overlap)")
            seen.add(i)
            for c in range(num_classes):
                all_boxes[c][i] = per_class[c]
    if len(seen) != n_images:
        missing = sorted(set(range(n_images)) - seen)[:5]
        raise ValueError(f"merged detections cover {len(seen)}/{n_images} "
                         f"images (first missing: {missing})")
    return all_boxes
