"""Detector core: backbones, RPN, target assignment, Faster R-CNN assembly.

TPU-first rebuild of the reference detector layer (``lib/model/rpn/``,
``lib/model/faster_rcnn/``): NHWC layouts, static shapes everywhere, all
target assignment as masked fixed-count selection with ``jax.random`` keys,
the full train forward (both domains + all losses) inside one jitted step.
"""

from tllod_tpu.models.backbones import (VGG16Features, VGG16Head,
                                        ResNetFeatures, ResNetHead)
from tllod_tpu.models.faster_rcnn import FasterRCNN

__all__ = ["VGG16Features", "VGG16Head", "ResNetFeatures", "ResNetHead",
           "FasterRCNN"]
