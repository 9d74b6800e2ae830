"""tllod_tpu — TPU-native Transfer-Learning Library for Object Detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
live-group/Transfer-Learning-Library-for-Object-Detection (reference at
/root/reference): domain-adaptive / domain-generalized / universal-DA object
detection methods (DAF, MAF, ATF, IDF, PA-ATF, PT-MAF, MAD, US-DAF) built on a
shared Faster R-CNN detector — redesigned TPU-first:

  * static-shape, fully-jitted train/eval steps (no host round trips)
  * Pallas/XLA kernels for NMS / RoIAlign / RoIPool (reference: CUDA + FFI)
  * SPMD batch parallelism via jax.sharding.Mesh + collectives
    (reference: single-GPU nn.DataParallel)
  * one parameterized data layer instead of nine per-method forks
"""

__version__ = "0.1.0"
