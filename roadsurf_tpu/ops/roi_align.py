"""Multilevel RoIAlign (ROIAlignV2 semantics) for TPU.

Replaces detectron2's CUDA ROIAlignV2 op (pinned at
detectron2_config_3bands.yaml:174,221: aligned=True half-pixel sampling,
pooler resolutions 7/14) with an XLA-native design:

* all FPN levels are flattened and concatenated into one (B, ΣHW, C)
  tensor so a single gather serves every ROI regardless of its level —
  no per-level branching, no wasted 4x compute;
* each ROI's level follows the canonical FPN assignment
  floor(k0 + log2(sqrt(area)/224)) clamped to [P2, P5];
* sampling grid is a fixed 2x2 per bin (detectron2's sampling_ratio=0 is
  adaptive ceil(roi/out); at the pinned 800px test scale that is 2 for
  typical road instances, and a fixed grid keeps shapes static for XLA);
* ROIs are processed in chunks via lax.map to bound gather intermediates.

A Pallas kernel can later replace the inner gather; the public signature is
stable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _interp_weights(coord, limit):
    """ROIAlignV2 bilinear weights along one axis.

    coord: continuous pixel coordinate (already -0.5 shifted).
    Returns (i_lo, i_hi, w_lo, w_hi, valid).
    """
    limit = jnp.asarray(limit, coord.dtype)
    valid = (coord >= -1.0) & (coord <= limit)
    c = jnp.clip(coord, 0.0, limit - 1.0)
    lo = jnp.floor(c)
    w_hi = c - lo
    w_lo = 1.0 - w_hi
    i_lo = lo.astype(jnp.int32)
    i_hi = jnp.minimum(i_lo + 1, limit.astype(jnp.int32) - 1)
    return i_lo, i_hi, w_lo, w_hi, valid


def roi_align_multilevel(feats: list, boxes: jnp.ndarray, out_size: int,
                         sampling: int = 2, canonical_size: int = 224,
                         canonical_level: int = 4, min_level: int = 2,
                         max_level: int = 5, chunk: int = 0) -> jnp.ndarray:
    """feats: [P2..P5] NHWC tensors; boxes: (B, R, 4) XYXY in image coords.

    Returns (B, R, out_size, out_size, C) float32 pooled features.
    """
    B, _, _, C = feats[0].shape
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum([h * w for h, w in sizes])]), jnp.int32)
    strides = jnp.asarray([2 ** (min_level + i) for i in range(len(feats))],
                          jnp.float32)
    Hs = jnp.asarray([h for h, _ in sizes], jnp.float32)
    Ws = jnp.asarray([w for _, w in sizes], jnp.float32)

    # level assignment (canonical FPN heuristic)
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    area = w * h
    lvl = jnp.floor(canonical_level
                    + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    lvl = jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level

    S = out_size * sampling
    u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / sampling  # in bin units

    def per_image(flat_i, boxes_i, lvl_i):
        def per_chunk(args):
            bxs, lv = args                  # (K, 4), (K,)
            fdt = flat_i.dtype
            stride = strides[lv]            # (K,)
            Hl = Hs[lv]
            Wl = Ws[lv]
            off = offsets[lv]
            bw = (bxs[:, 2] - bxs[:, 0]) / out_size  # bin width (K,)
            bh = (bxs[:, 3] - bxs[:, 1]) / out_size
            # sample coords on the level grid, half-pixel aligned (V2)
            sx = (bxs[:, 0:1] + u[None, :] * bw[:, None]) / stride[:, None] - 0.5
            sy = (bxs[:, 1:2] + u[None, :] * bh[:, None]) / stride[:, None] - 0.5
            ix0, ix1, wx0, wx1, vx = _interp_weights(sx, Wl[:, None])
            iy0, iy1, wy0, wy1, vy = _interp_weights(sy, Hl[:, None])
            wx0 = jnp.where(vx, wx0, 0.0)
            wx1 = jnp.where(vx, wx1, 0.0)
            wy0 = jnp.where(vy, wy0, 0.0)
            wy1 = jnp.where(vy, wy1, 0.0)
            Wi = Wl.astype(jnp.int32)

            def corner(iy, wy, ix, wx):
                idx = (off[:, None, None] + iy[:, :, None] * Wi[:, None, None]
                       + ix[:, None, :])                      # (K, S, S)
                vals = jnp.take(flat_i, idx.reshape(-1), axis=0)
                vals = vals.reshape(idx.shape + (C,))
                w = (wy[:, :, None] * wx[:, None, :]).astype(fdt)
                return vals * w[..., None]

            # accumulate corners in the feature dtype; final mean in f32
            acc = (corner(iy0, wy0, ix0, wx0) + corner(iy0, wy0, ix1, wx1)
                   + corner(iy1, wy1, ix0, wx0) + corner(iy1, wy1, ix1, wx1))
            # average the sampling grid inside each bin
            K = acc.shape[0]
            acc = acc.reshape(K, out_size, sampling, out_size, sampling, C)
            return acc.astype(jnp.float32).mean(axis=(2, 4))

        R = boxes_i.shape[0]
        if chunk and R % chunk == 0 and R > chunk:
            n = R // chunk
            out = jax.lax.map(per_chunk,
                              (boxes_i.reshape(n, chunk, 4),
                               lvl_i.reshape(n, chunk)))
            return out.reshape(R, out_size, out_size, C)
        return per_chunk((boxes_i, lvl_i))

    return jax.vmap(per_image)(flat, boxes, lvl)
