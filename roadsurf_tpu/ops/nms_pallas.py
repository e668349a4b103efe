"""Batched greedy NMS as one Pallas TPU kernel.

The greedy scan is inherently sequential over score rank, so as an XLA
fori_loop every step pays dispatch overhead (~tens of µs on a remote-hosted
chip) — 1-2k steps cost tens of ms. Inside a single Pallas kernel the loop
body is just VPU work on VMEM-resident data and the whole *batch* rides the
vector lanes of each step: arrays are laid out (N, B) so the pivot box of
step i is one sublane row read, and the suppression update is a handful of
(N, B) vector ops. Total ≈ N × ~15 vreg-ops — milliseconds for
(B=64, N≈2k) instead of tens of ms.

Semantics are exactly torchvision/detectron2 greedy NMS (suppressed boxes
cannot suppress; ties by input order). The public entry
:func:`batched_nms_batch` applies the per-category coordinate-offset trick
and falls back to the pure-XLA loop on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .nms import NEG_INF, nms_fixed

_SUBLANE = 8


def _nms_kernel(x0r, y0r, x1r, y1r, arear, keepr, *, n: int,
                iou_thresh: float):
    keepr[:] = jnp.ones_like(keepr)

    rows = jax.lax.broadcasted_iota(jnp.int32, keepr.shape, 0)

    def body(i, _):
        import jax.experimental.pallas as pl
        xi0 = x0r[pl.ds(i, 1), :]
        yi0 = y0r[pl.ds(i, 1), :]
        xi1 = x1r[pl.ds(i, 1), :]
        yi1 = y1r[pl.ds(i, 1), :]
        ai = arear[pl.ds(i, 1), :]
        ki = keepr[pl.ds(i, 1), :]

        w = jnp.maximum(jnp.minimum(x1r[:], xi1) - jnp.maximum(x0r[:], xi0),
                        0.0)
        h = jnp.maximum(jnp.minimum(y1r[:], yi1) - jnp.maximum(y0r[:], yi0),
                        0.0)
        inter = w * h
        union = arear[:] + ai - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        sup = (iou > iou_thresh) & (ki > 0.0) & (rows > i)
        keepr[:] = jnp.where(sup, 0.0, keepr[:])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def nms_keep_mask(boxes: jnp.ndarray, valid: jnp.ndarray,
                  iou_thresh: float, interpret: bool = False) -> jnp.ndarray:
    """Greedy-NMS keep mask for score-DESC-sorted boxes.

    boxes (B, N, 4) already sorted by score descending per image; ``valid``
    marks real entries (padding never suppresses since its area is 0, but it
    is masked out of the result). Returns keep (B, N) bool.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = boxes.shape[:2]
    n_pad = ((N + _SUBLANE - 1) // _SUBLANE) * _SUBLANE

    def prep(c):
        x = jnp.transpose(c, (1, 0)).astype(jnp.float32)   # (N, B)
        return jnp.pad(x, ((0, n_pad - N), (0, 0)))

    x0 = prep(boxes[..., 0])
    y0 = prep(boxes[..., 1])
    x1 = prep(boxes[..., 2])
    y1 = prep(boxes[..., 3])
    zero = jnp.zeros_like(x0)
    area = jnp.maximum(x1 - x0, zero) * jnp.maximum(y1 - y0, zero)
    area = jnp.where(jnp.pad(jnp.transpose(valid, (1, 0)),
                             ((0, n_pad - N), (0, 0))), area, 0.0)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n=N, iou_thresh=iou_thresh),
        out_shape=jax.ShapeDtypeStruct((n_pad, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0, y0, x1, y1, area)
    return jnp.transpose(keep[:N] > 0.5, (1, 0)) & valid


def nms_fixed_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
                    iou_thresh: float, max_out: int):
    """Batched greedy NMS: boxes (B, N, 4), scores (B, N) → per-image
    (keep_scores (B, K), keep_idx (B, K)), exactly matching
    vmap(nms_fixed) but executed as one Pallas kernel on TPU."""
    if jax.default_backend() != "tpu":
        return jax.vmap(
            lambda b, s: nms_fixed(b, s, iou_thresh, max_out))(boxes, scores)

    order = jnp.argsort(-scores, axis=1)
    sboxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    sscores = jnp.take_along_axis(scores, order, axis=1)
    valid = sscores > NEG_INF / 2
    keep = nms_keep_mask(sboxes, valid, iou_thresh)
    kept_scores = jnp.where(keep, sscores, NEG_INF)
    top_scores, top_i = jax.lax.top_k(kept_scores, max_out)
    idx = jnp.take_along_axis(order, top_i, axis=1)
    return top_scores, idx


def batched_nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
                      idxs: jnp.ndarray, iou_thresh: float, max_out: int):
    """Category-aware batched NMS over a whole image batch (the coordinate
    -offset trick per image, one kernel for the batch)."""
    valid = scores > NEG_INF / 2
    max_coord = jnp.max(
        jnp.where(valid, jnp.max(boxes, axis=-1), 0.0),
        axis=1, keepdims=True) + 1.0                       # (B, 1)
    offs = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offs[..., None]
    return nms_fixed_batch(shifted, scores, iou_thresh, max_out)
