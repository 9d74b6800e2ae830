"""Static-shape greedy NMS for TPU.

Replaces the reference's CUDA bitmask kernel + host-side greedy mask scan
(``lib/model/nms/src/nms_cuda_kernel.cu:31-154``, ``lib/model/nms/nms_gpu.py:7``)
with a fully on-device, fixed-shape XLA program, so the RPN proposal layer can
live inside one jitted train step with no device→host→device round trip.

Algorithm (exact greedy NMS, same selections as the reference):
  1. sort boxes by score descending (padded/invalid slots sort last);
  2. sweep over fixed-size blocks of the sorted list with ``lax.while_loop``;
     for each block, compute its IoU against *all* boxes once (a (T, N)
     matrix — bandwidth-friendly, MXU-free VPU work);
  3. suppress block boxes that overlap an already-kept earlier box, then
     resolve the sequential within-block dependency by the "definite keeper"
     fixpoint iteration (a box whose column has no live suppressor is
     definitely kept; rows of boxes it suppresses are zeroed; repeat until
     stable — the same trick TF's TPU ``non_max_suppression_padded`` uses,
     provably equal to sequential greedy);
  4. early-exit the block sweep once ``max_output`` boxes are kept.

IoU uses the legacy "+1" box convention to match ``devIoU``
(``nms_cuda_kernel.cu:31-39``); suppression is strict ``iou > thresh``
(keep ``<= thresh``), matching ``nms_cpu`` (``lib/model/nms/nms_cpu.py:30``).

The numpy oracle :func:`nms_numpy` reimplements the reference CPU path and is
used by the unit tests to verify the XLA kernel selects identical boxes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = float(np.finfo(np.float32).min)


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(T, 4) × (N, 4) → (T, N) IoU with the "+1" area convention."""
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    iw = (jnp.minimum(a[:, 2][:, None], b[:, 2][None, :])
          - jnp.maximum(a[:, 0][:, None], b[:, 0][None, :]) + 1.0)
    ih = (jnp.minimum(a[:, 3][:, None], b[:, 3][None, :])
          - jnp.maximum(a[:, 1][:, None], b[:, 1][None, :]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _self_suppress(over: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """Resolve greedy keep decisions within one block.

    ``over``: (T, T) bool, over[s, t] = candidate s (earlier in score order)
    overlaps t beyond threshold, already masked to strict upper triangle and to
    candidate rows/cols. Returns (T,) bool keep, identical to a sequential
    greedy scan.
    """
    t_sz = over.shape[0]

    def cond(state):
        _, changed, it = state
        return changed & (it < t_sz)

    def body(state):
        live, _, it = state
        # A candidate with no live suppressor above it is definitely kept.
        suppressed = jnp.any(over & live[:, None], axis=0)
        definite = cand & ~suppressed
        # Boxes suppressed by a definite keeper can never suppress others.
        killed = jnp.any(over & definite[:, None], axis=0)
        new_live = live & ~killed
        return new_live, jnp.any(new_live != live), it + 1

    live0 = cand
    live, _, _ = jax.lax.while_loop(cond, body, (live0, jnp.bool_(True),
                                                 jnp.int32(0)))
    return cand & ~jnp.any(over & live[:, None], axis=0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_output",
                                             "block_size", "presorted"))
def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, *,
              iou_threshold: float, max_output: int,
              block_size: int = 512, presorted: bool = False):
    """Greedy NMS with fixed output shape.

    Args:
      boxes: (N, 4) xyxy float32. Padded slots may hold anything.
      scores: (N,) float32. Use ``-inf`` (or any score below all real ones
        paired with ``valid=False`` padding handled by caller) to mark padded
        slots; slots with score == float32 min are never selected.
      iou_threshold: suppression threshold (suppress when IoU > threshold).
      max_output: static number of output slots.
      presorted: scores are already descending (e.g. straight out of
        ``lax.top_k``) — skips the internal argsort.

    Returns:
      idx: (max_output,) int32 indices into the input, in descending score
        order, padded with 0 beyond ``num_keep``.
      num_keep: () int32 count of valid entries in ``idx``.
    """
    n = boxes.shape[0]
    t_sz = min(block_size, max(n, 1))
    n_pad = ((n + t_sz - 1) // t_sz) * t_sz
    num_blocks = n_pad // t_sz

    if presorted:
        # no argsort AND no gather — the sorted view is the input itself
        order = jnp.arange(n)
        boxes_o, scores_o = boxes, scores
    else:
        order = jnp.argsort(-scores)
        boxes_o, scores_o = boxes[order], scores[order]
    boxes_s = jnp.concatenate(
        [boxes_o, jnp.zeros((n_pad - n, 4), boxes.dtype)], axis=0)
    scores_s = jnp.concatenate(
        [scores_o, jnp.full((n_pad - n,), _NEG_INF, scores.dtype)],
        axis=0)
    valid = scores_s > _NEG_INF

    col_ids = jnp.arange(n_pad)

    def cond(state):
        _, bi, kept_count = state
        return (bi < num_blocks) & (kept_count < max_output)

    def body(state):
        keep, bi, _ = state
        start = bi * t_sz
        blk_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (t_sz, 4))
        blk_valid = jax.lax.dynamic_slice(valid, (start,), (t_sz,))
        iou = _pairwise_iou(blk_boxes, boxes_s)          # (T, n_pad)
        over_all = iou > iou_threshold

        # Suppression by kept boxes from earlier blocks.
        earlier = col_ids < start
        sup_prev = jnp.any(over_all & (keep & earlier)[None, :], axis=1)
        cand = blk_valid & ~sup_prev

        # Within-block sequential dependency.
        blk_iou = jax.lax.dynamic_slice(iou, (0, start), (t_sz, t_sz))
        rows = jnp.arange(t_sz)
        tri = rows[:, None] < rows[None, :]              # s strictly above t
        over_blk = (blk_iou > iou_threshold) & tri & cand[:, None] & cand[None, :]
        blk_keep = _self_suppress(over_blk, cand)

        new_keep = jax.lax.dynamic_update_slice(keep, blk_keep, (start,))
        return new_keep, bi + 1, jnp.sum(new_keep.astype(jnp.int32))

    keep0 = jnp.zeros((n_pad,), jnp.bool_)
    keep, _, _ = jax.lax.while_loop(cond, body,
                                    (keep0, jnp.int32(0), jnp.int32(0)))

    # Compact: first max_output kept positions, in score order.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    write_to = jnp.where(keep & (rank < max_output), rank, max_output)
    orig = jnp.concatenate([order, jnp.zeros((n_pad - n,), order.dtype)])
    idx = jnp.zeros((max_output + 1,), jnp.int32).at[write_to].set(
        orig.astype(jnp.int32), mode="drop")[:max_output]
    num_keep = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_output)
    return idx, num_keep


def nms_numpy(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Reference-semantics greedy NMS on CPU; the unit-test oracle.

    Same algorithm as the reference CPU fallback
    (``lib/model/nms/nms_cpu.py:6-36``): sort by score, repeatedly keep the
    best remaining box and drop everything overlapping it by more than
    ``thresh`` ("+1" areas).
    """
    x1, y1, x2, y2, scores = dets.T[:5]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return np.asarray(keep, dtype=np.int64)
