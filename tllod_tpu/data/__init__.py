"""Data layer: VOC-format datasets, roidb pipeline, TPU-shaped batch loader,
and VOC evaluation.

ONE parameterized data layer replacing the reference's nine near-identical
forks (``lib/roi_data_layer/`` plus per-method copies in ``lib/<METHOD>/`` —
see SURVEY §2.4): domain labels are an explicit loader parameter instead of a
filename-sniffing hack (``lib/DAF/minibatch.py:34-39``).
"""

from tllod_tpu.data.voc import VOCDetection, CLASS_SETS
from tllod_tpu.data.factory import get_dataset, register_dataset
from tllod_tpu.data.roidb import combined_roidb
from tllod_tpu.data.loader import DetectionLoader, EvalLoader
from tllod_tpu.data.voc_eval import voc_ap, voc_eval

__all__ = ["VOCDetection", "CLASS_SETS", "get_dataset", "register_dataset",
           "combined_roidb", "DetectionLoader", "EvalLoader", "voc_ap",
           "voc_eval"]
