"""Fixed-shape non-maximum suppression for TPU.

Replaces detectron2/torchvision's CUDA batched_nms with an XLA-native design:
everything is padded to static shapes (invalid entries carry score -inf) and
the greedy suppression runs as an on-device lax.fori_loop over score rank —
each step is one fused vector op, and batching (images × levels / classes)
rides the same loop for free via vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
              max_out: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over (N, 4) boxes / (N,) scores (higher first).

    Returns (keep_scores, keep_idx) of length max_out: the selected boxes'
    scores (suppressed/padded entries at NEG_INF) and their indices into the
    input arrays. Exact greedy semantics (same result as torchvision.nms).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    sscores = scores[order]
    # per-box areas once; IoU rows are computed inside the loop body so the
    # O(N^2) matrix is never materialized in HBM (N=1-2k would be hundreds of
    # MB across a batch).
    areas = jnp.maximum(sboxes[:, 2] - sboxes[:, 0], 0) \
        * jnp.maximum(sboxes[:, 3] - sboxes[:, 1], 0)
    rng = jnp.arange(n)

    def body(i, keep):
        b = jax.lax.dynamic_slice(sboxes, (i, 0), (1, 4))[0]
        lt = jnp.maximum(sboxes[:, :2], b[:2])
        rb = jnp.minimum(sboxes[:, 2:], b[2:])
        wh = jnp.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        union = areas + areas[i] - inter
        iou_row = jnp.where(union > 0, inter / union, 0.0)
        row = (iou_row > iou_thresh) & keep[i]
        return keep & ~(row & (rng > i))

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    kept_scores = jnp.where(keep & (sscores > NEG_INF / 2), sscores, NEG_INF)
    top_scores, top_i = jax.lax.top_k(kept_scores, max_out)
    return top_scores, order[top_i]


def batched_nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
                      idxs: jnp.ndarray, iou_thresh: float,
                      max_out: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS (torchvision.batched_nms equivalent): boxes with
    different ``idxs`` (level or class id) never suppress each other.

    Implemented with the coordinate-offset trick: shift each category's boxes
    to a disjoint region so one plain NMS handles all categories.
    """
    max_coord = jnp.max(jnp.where(scores > NEG_INF / 2,
                                  jnp.max(boxes, axis=-1), 0.0)) + 1.0
    offs = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offs[:, None]
    return nms_fixed(shifted, scores, iou_thresh, max_out)
