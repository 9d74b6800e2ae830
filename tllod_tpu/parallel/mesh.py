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


def make_mesh_2d(data: int, model: int,
                 devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D ``(data, model)`` mesh: batch sharded over ``data``, the box
    head's fc weights sharded over ``model`` (:func:`tp_param_shardings`).

    The reference has no model parallelism at all (``nn.DataParallel``
    only); this is the TPU-native extension — one mesh, two named axes,
    XLA/GSPMD inserts the all-gather/reduce-scatter pair for the
    column/row-split fc stack over ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    if data * model > len(devs):
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices,"
                         f" have {len(devs)}")
    return Mesh(np.asarray(devs[:data * model]).reshape(data, model),
                ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def spatial_image_sharding(mesh: Mesh) -> NamedSharding:
    """Shard images (B, H, W, C) on batch AND image height: spatial
    partitioning of the conv backbone over the "model" axis. GSPMD inserts
    the halo exchanges between H-neighbor devices for every conv/pool; the
    feature map is re-gathered automatically where the program stops being
    spatially shardable (the proposal layer's global top-k / RoIAlign
    gathers). The conv FLOPs — ~90% of the step — split model-ways."""
    return NamedSharding(mesh, P("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style split of the two big fc layers (102M of VGG16's 142M
# params): fc6 column-parallel (output features sharded → its activations
# stay sharded through ReLU/dropout), fc7 row-parallel (contraction over the
# sharded dim → XLA inserts one reduce over "model"). Everything else —
# convs, RPN, cls_score/bbox_pred, DA heads — is replicated (pure DP).
_TP_RULES = (
    (("fc6", "kernel"), P(None, "model")),
    (("fc6", "bias"), P("model")),
    (("fc7", "kernel"), P("model", None)),
)

# ResNet head (layer4 bottlenecks, the per-RoI compute of res50/101/152):
# 1×1 convs column-parallel on output channels, the 3×3 row-parallel on the
# sharded input channels (GSPMD inserts the reduce), FrozenBN affines
# sharded to match their conv's output. The residual pair (conv3 /
# downsample_conv) shards identically so the add needs no resharding.
_TP_RESNET_HEAD_RULES = (
    (("conv1", "kernel"), P(None, None, None, "model")),
    (("conv2", "kernel"), P(None, None, "model", None)),
    (("conv3", "kernel"), P(None, None, None, "model")),
    (("downsample_conv", "kernel"), P(None, None, None, "model")),
    (("bn1",), P("model")),
    (("bn3",), P("model")),
    (("downsample_bn",), P("model")),
)


def tp_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for ``params`` on a ``(data, model)`` mesh:
    fc head tensor-parallel over "model", the rest replicated.

    Pipeline and expert parallelism are deliberately absent: the largest
    model family here (VGG16 DAF, 142M params + momentum ≈ 1.1 GB) fits
    comfortably on one chip, and no method uses mixture-of-experts.
    """
    matched = [0]

    def spec_for(path) -> P:
        keys = tuple(str(getattr(p, "key", getattr(p, "name", p)))
                     for p in path)
        for suffix, spec in _TP_RULES:
            if keys[-len(suffix):] == suffix:
                matched[0] += 1
                return spec
        if any(k.startswith("layer4_") for k in keys):
            for suffix, spec in _TP_RESNET_HEAD_RULES:
                if keys[-len(suffix) - 1:-1] == suffix or \
                        keys[-len(suffix):] == suffix:
                    matched[0] += 1
                    return spec
        return P()

    out = jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, spec_for(path)), params)
    if not matched[0]:
        # safety net for future nets with neither a VGG fc head nor a
        # ResNet layer4 — tp would silently replicate everything
        import warnings
        warnings.warn(
            "tp_param_shardings: no parameter matched the tensor-parallel "
            "rules (fc6/fc7 or layer4 bottlenecks) — nothing to split; "
            "--tp will only replicate. Use pure data parallelism (--mGPUs) "
            "instead.", stacklevel=2)
    return out


def _data_axis_size(mesh: Mesh) -> int:
    return (mesh.shape["data"] if "data" in mesh.axis_names
            else mesh.size)


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    """Fail fast (instead of an opaque XLA sharding error at device_put
    time) when the global batch can't be split evenly over the data axis.
    The reference's ``nn.DataParallel`` silently imbalanced such batches;
    here dim-0 sharding requires exact divisibility."""
    n = _data_axis_size(mesh)
    if batch_size % n != 0:
        raise ValueError(
            f"--mGPUs: global batch size {batch_size} is not divisible by "
            f"the {n}-way data axis; use --bs with a multiple of {n} "
            f"(e.g. --bs {((batch_size // n) + 1) * n}).")


def place_global(v, mesh: Mesh, spec) -> Any:
    """Place one host array onto the mesh under ``spec``.

    Single-process: a plain ``device_put``. Under ``jax.distributed``
    (multi-process training), ``v`` is this process's LOCAL chunk of the
    global batch and rides ``host_local_array_to_global_array`` — the
    multi-process mirror of the reference-free design in SURVEY §2.5
    ("N devices see N shards of the sampler")."""
    if jax.process_count() == 1:
        return jax.device_put(v, NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(v), mesh, spec)


def sync_image_shapes(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Multi-process only: agree on one padded image shape across processes.

    Each process's loader pads its local batch to its OWN bucket; the global
    array requires identical non-batch dims, so allgather the local (H, W)
    and zero-pad every process to the elementwise max (identical semantics
    to the loader's own bucket padding — ``im_info`` keeps true sizes, so
    padding stays outside-image)."""
    if jax.process_count() == 1:
        return batch
    from jax.experimental import multihost_utils

    im = np.asarray(batch["im_data"])
    shapes = np.asarray(multihost_utils.process_allgather(
        np.asarray(im.shape[1:3], np.int64)))
    h, w = int(shapes[..., 0].max()), int(shapes[..., 1].max())
    if (h, w) != im.shape[1:3]:
        padded = np.zeros((im.shape[0], h, w, im.shape[3]), im.dtype)
        padded[:, :im.shape[1], :im.shape[2]] = im
        batch = dict(batch, im_data=padded)
    return batch


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, *,
                spatial: bool = False) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded on dim 0.

    With ``spatial=True`` (requires a mesh with a "model" axis), the image
    tensor is additionally sharded on its height dim —
    :func:`spatial_image_sharding`. Under ``jax.distributed`` the dict is
    this process's local batch slice (see :func:`place_global`)."""
    if spatial and "model" not in mesh.axis_names:
        raise ValueError("spatial sharding needs a (data, model) mesh "
                         "— use make_mesh_2d / --tp")
    batch = sync_image_shapes(batch)
    for v in batch.values():
        if hasattr(v, "shape") and v.ndim >= 1:
            check_batch_divisible(v.shape[0] * jax.process_count(), mesh)
            break
    return {k: place_global(v, mesh,
                            P("data", "model") if spatial and k == "im_data"
                            else P("data"))
            for k, v in batch.items()}
