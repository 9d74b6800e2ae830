"""SPMD parallelism over a jax.sharding.Mesh.

The reference has NO distributed runtime (single-process ``nn.DataParallel``
only — SURVEY §2.5). This package is the TPU-native first-class replacement:
one ``Mesh`` over ICI, batch-sharded jitted train steps, XLA-inserted psum
gradient reduction, host-sharded input pipeline.
"""

from tllod_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicate, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate"]
