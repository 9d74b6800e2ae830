"""Static-shape greedy NMS for TPU.

Replaces the reference's CUDA bitmask kernel + host-side greedy mask scan
(``lib/model/nms/src/nms_cuda_kernel.cu:31-154``, ``lib/model/nms/nms_gpu.py:7``)
with a fully on-device, fixed-shape XLA program, so the RPN proposal layer can
live inside one jitted train step with no device→host→device round trip.

Algorithm (exact greedy NMS, same selections as the reference):
  1. sort boxes by score descending (padded/invalid slots sort last);
  2. sweep over fixed-size blocks of the sorted list with ``lax.while_loop``;
     for each block, compute its IoU against the *kept-box buffer* — a
     compact (max_output, 4) array of the boxes kept by earlier blocks —
     instead of against all N boxes. Only earlier KEPT boxes can suppress,
     and at most ``max_output`` of them exist before the sweep early-exits,
     so a (T, max_output) IoU matrix carries the same information as the
     naive (T, N) one at a fraction of the VPU work (6× less for the
     train proposal shape 12000→2000, 20× for the test shape 6000→300);
  3. resolve the sequential within-block dependency by the "definite keeper"
     fixpoint iteration over the (T, T) within-block IoU (a box whose column
     has no live suppressor is definitely kept; rows of boxes it suppresses
     are zeroed; repeat until stable — the same trick TF's TPU
     ``non_max_suppression_padded`` uses, provably equal to sequential
     greedy), then append the block's keepers to the buffer;
  4. early-exit the block sweep once ``max_output`` boxes are kept.
     (A block may overshoot ``max_output``; overshoot keepers fall off the
     buffer, which is exact because the sweep stops before any later block
     could need them, and the final compaction trims to ``max_output``.)

When everything fits in ONE block (n ≤ block_size — the per-class NMS of
the eval postprocess) the while_loop machinery is skipped entirely: one
(T, T) IoU + one fixpoint.

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

    rows = jnp.arange(t_sz)
    tri = rows[:, None] < rows[None, :]                  # s strictly above t

    def block_keep(blk_boxes, cand):
        """Greedy keep decisions within one block given candidates."""
        blk_iou = _pairwise_iou(blk_boxes, blk_boxes)    # (T, T)
        over_blk = ((blk_iou > iou_threshold) & tri
                    & cand[:, None] & cand[None, :])
        return _self_suppress(over_blk, cand)

    if num_blocks == 1:
        # everything in one block: no sweep state, no kept buffer
        keep = block_keep(boxes_s, valid)
    else:
        # kept-box buffer, lane-aligned; rows ≥ kept_count are dead
        kb_sz = max(((max_output + 127) // 128) * 128, 128)
        kb_ids = jnp.arange(kb_sz)

        def cond(state):
            _, _, bi, kept_count = state
            return (bi < num_blocks) & (kept_count < max_output)

        def body(state):
            keep, kbuf, bi, kept_count = state
            start = bi * t_sz
            blk_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (t_sz, 4))
            blk_valid = jax.lax.dynamic_slice(valid, (start,), (t_sz,))

            # Suppression by kept boxes from earlier blocks (the buffer).
            iou_prev = _pairwise_iou(blk_boxes, kbuf)    # (T, kb_sz)
            live = kb_ids < kept_count
            sup_prev = jnp.any((iou_prev > iou_threshold) & live[None, :],
                               axis=1)
            cand = blk_valid & ~sup_prev

            blk_keep = block_keep(blk_boxes, cand)

            # Append this block's keepers to the buffer in score order.
            rank = kept_count + jnp.cumsum(blk_keep.astype(jnp.int32)) - 1
            write_to = jnp.where(blk_keep & (rank < kb_sz), rank, kb_sz)
            new_kbuf = kbuf.at[write_to].set(blk_boxes, mode="drop")

            new_keep = jax.lax.dynamic_update_slice(keep, blk_keep, (start,))
            new_count = kept_count + jnp.sum(blk_keep.astype(jnp.int32))
            return new_keep, new_kbuf, bi + 1, new_count

        keep0 = jnp.zeros((n_pad,), jnp.bool_)
        kbuf0 = jnp.zeros((kb_sz, 4), boxes.dtype)
        keep, _, _, _ = jax.lax.while_loop(
            cond, body, (keep0, kbuf0, jnp.int32(0), jnp.int32(0)))

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
