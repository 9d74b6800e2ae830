"""TPU-native detection ops: box math, NMS, RoI feature extraction, losses.

Replaces the reference's L0/L1 layers — four hand-written CUDA kernels plus
torch box utilities (``lib/model/nms``, ``lib/model/roi_align``,
``lib/model/roi_pooling``, ``lib/model/roi_crop``, ``lib/model/rpn/
bbox_transform.py``, ``lib/model/utils/bbox.pyx``) — with static-shape
XLA/Pallas implementations that live entirely inside jitted programs.
"""

from tllod_tpu.ops.anchors import generate_anchors, shift_anchors
from tllod_tpu.ops.boxes import (
    bbox_overlaps,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
)
from tllod_tpu.ops.nms import nms_fixed, nms_numpy
from tllod_tpu.ops.roi_align import roi_align, roi_align_avg
from tllod_tpu.ops.roi_pool import roi_pool
from tllod_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy
from tllod_tpu.ops.grl import grad_reverse

__all__ = [
    "generate_anchors", "shift_anchors",
    "bbox_overlaps", "bbox_transform", "bbox_transform_inv", "clip_boxes",
    "nms_fixed", "nms_numpy",
    "roi_align", "roi_align_avg", "roi_pool",
    "smooth_l1_loss", "softmax_cross_entropy", "grad_reverse",
]
