"""Host-side native (C++) box ops with transparent numpy fallback.

Build in place with:  python setup.py build_ext --inplace
(or ``pip install -e .``). Unbuilt environments fall back to vectorized
numpy with identical results — the extension is a host-path speedup, not a
correctness dependency.
"""

from __future__ import annotations

import numpy as np

try:
    from tllod_tpu.native import _native  # type: ignore
    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    _native = None
    HAVE_NATIVE = False


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(N, 4) × (K, 4) → (N, K) IoU with the "+1" convention (the
    cython_bbox counterpart, reference ``lib/model/utils/bbox.pyx:15-55``)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    if HAVE_NATIVE:
        buf = _native.bbox_overlaps(boxes, query)
        return np.frombuffer(buf, np.float32).reshape(len(boxes), len(query))
    # numpy fallback
    barea = ((boxes[:, 2] - boxes[:, 0] + 1)
             * (boxes[:, 3] - boxes[:, 1] + 1))[:, None]
    qarea = ((query[:, 2] - query[:, 0] + 1)
             * (query[:, 3] - query[:, 1] + 1))[None, :]
    iw = np.clip(np.minimum(boxes[:, 2:3], query[None, :, 2])
                 - np.maximum(boxes[:, 0:1], query[None, :, 0]) + 1, 0, None)
    ih = np.clip(np.minimum(boxes[:, 3:4], query[None, :, 3])
                 - np.maximum(boxes[:, 1:2], query[None, :, 1]) + 1, 0, None)
    inter = iw * ih
    return (inter / (barea + qarea - inter)).astype(np.float32)


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS keep indices (the nms_cpu counterpart)."""
    dets = np.ascontiguousarray(dets, np.float32)
    if HAVE_NATIVE:
        return np.asarray(_native.nms(dets, float(thresh)), np.int64)
    from tllod_tpu.ops.nms import nms_numpy
    return nms_numpy(dets, thresh)
