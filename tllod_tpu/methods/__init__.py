"""Transfer-learning methods: per-method loss modules over the shared
detector.

Each method here corresponds to one ``lib/<METHOD>/`` fork in the reference
(SURVEY §2.4) but composes the single :class:`~tllod_tpu.models.faster_rcnn.
FasterRCNN` via its granular methods instead of copying it. Training-time
machinery (GRL, discriminators, consistency/KD/etc. losses) lives in disjoint
param subtrees so eval restores the detector alone.
"""
