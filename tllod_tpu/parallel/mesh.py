"""Device mesh + sharding helpers.

Data parallelism (the only parallelism whose semantics the reference pins
down: "N devices see N shards of the sampler") is expressed as a 1-D ``data``
mesh axis: batches are sharded on dim 0, parameters replicated, and the jitted
train step lets XLA insert the ``psum`` for gradient reduction over ICI —
replacing ``nn.DataParallel`` + ``.mean()`` loss reduction
(``methods/DAF/DAF_train.py:341-342,397-400``).

Multi-host runs only add ``jax.distributed.initialize`` before
:func:`make_mesh`; the same code compiles unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    """Fail fast (instead of an opaque XLA sharding error at device_put
    time) when the global batch can't be split evenly over the data axis.
    The reference's ``nn.DataParallel`` silently imbalanced such batches;
    here dim-0 sharding requires exact divisibility."""
    n = mesh.size
    if batch_size % n != 0:
        raise ValueError(
            f"--mGPUs: global batch size {batch_size} is not divisible by "
            f"the {n}-device mesh; use --bs with a multiple of {n} "
            f"(e.g. --bs {((batch_size // n) + 1) * n}).")


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded on dim 0."""
    s = batch_sharding(mesh)
    for v in batch.values():
        if hasattr(v, "shape") and v.ndim >= 1:
            check_batch_divisible(v.shape[0], mesh)
            break
    return {k: jax.device_put(v, s) for k, v in batch.items()}
