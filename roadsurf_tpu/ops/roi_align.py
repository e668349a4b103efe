"""Multilevel RoIAlign (ROIAlignV2 semantics) for TPU.

Replaces detectron2's CUDA ROIAlignV2 op (pinned at
detectron2_config_3bands.yaml:174,221: aligned=True half-pixel sampling,
pooler resolutions 7/14) with two XLA-native execution paths sharing exact
bilinear semantics:

* **separable-matmul path** (default for tile-sized feature maps): bilinear
  interpolation is separable, so pooling becomes two dense contractions per
  level — ``wy (R,P,H) × feat (H,W,C) × wx (R,Q,W)`` — that run on the MXU.
  The per-axis weight matrices fold the 2×2 sampling grid and the per-ROI
  level mask, so invalid/other-level ROIs contribute zeros and the four
  FPN levels sum into one output. This turns the former gather storm
  (~200k scattered vector loads per image) into ~300 GFLOP of batched
  matmul — a >20× wall-clock win on 256px tiles.
* **gather path** (large feature maps, e.g. the 800px parity profile where
  dense (R·P, W·C) intermediates would dominate): one flattened gather over
  concatenated levels, processed per image.

Both paths share `_interp_weights`: V2 half-pixel alignment, samples outside
[-1, size] dropped, indices clamped at the border (matching the CUDA op and
the numpy reference in tests/test_model.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# feature maps up to this many pixels use the separable-matmul path
_MATMUL_PATH_MAX_HW = 160 * 160


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


def _level_assignment(boxes, canonical_size, canonical_level, min_level,
                      max_level):
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    area = w * h
    lvl = jnp.floor(canonical_level
                    + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def _axis_weight_matrix(lo, bin_size, dim: int, stride: float,
                        out_size: int, sampling: int):
    """Per-ROI interpolation matrix along one axis: (B, R, out_size, dim).

    Row p holds the averaged bilinear taps of that bin's ``sampling``
    half-pixel-aligned sample points (V2 semantics of _interp_weights).
    """
    S = out_size * sampling
    u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / sampling
    coord = (lo[..., None] + u * bin_size[..., None]) / stride - 0.5
    i_lo, i_hi, w_lo, w_hi, valid = _interp_weights(coord, float(dim))
    w_lo = jnp.where(valid, w_lo, 0.0)
    w_hi = jnp.where(valid, w_hi, 0.0)
    d = jnp.arange(dim, dtype=jnp.int32)
    m = ((d == i_lo[..., None]) * w_lo[..., None]
         + (d == i_hi[..., None]) * w_hi[..., None])
    B, R = lo.shape
    return m.reshape(B, R, out_size, sampling, dim).sum(3) / sampling


def _roi_align_separable(feats, boxes, lvl, out_size, sampling, min_level,
                         img_chunk: int = 4):
    """MXU path: per-level separable interpolation matmuls, levels summed."""
    B, R = boxes.shape[:2]
    P = out_size
    x0, y0 = boxes[..., 0], boxes[..., 1]
    bw = (boxes[..., 2] - boxes[..., 0]) / P
    bh = (boxes[..., 3] - boxes[..., 1]) / P

    wys, wxs = [], []
    for li, f in enumerate(feats):
        Hl, Wl = f.shape[1], f.shape[2]
        stride = float(2 ** (min_level + li))
        wy = _axis_weight_matrix(y0, bh, Hl, stride, P, sampling)
        wx = _axis_weight_matrix(x0, bw, Wl, stride, P, sampling)
        # fold the level mask into wy: other-level ROIs contribute zeros
        wy = wy * (lvl == li)[..., None, None].astype(wy.dtype)
        wys.append(wy)
        wxs.append(wx)

    def per_image(args):
        fs, ys, xs = args

        def pool_level(f_b, wy_b, wx_b):
            t1 = jnp.einsum("rph,hwc->rpwc", wy_b.astype(f_b.dtype), f_b,
                            preferred_element_type=jnp.float32)
            return jnp.einsum("rpwc,rqw->rpqc", t1,
                              wx_b.astype(jnp.float32),
                              preferred_element_type=jnp.float32)

        acc = pool_level(fs[0], ys[0], xs[0])
        for f_b, wy_b, wx_b in zip(fs[1:], ys[1:], xs[1:]):
            acc = acc + pool_level(f_b, wy_b, wx_b)
        return acc

    xs_tree = (tuple(feats), tuple(wys), tuple(wxs))
    ic = img_chunk if B % img_chunk == 0 else 1
    if ic > 1:
        chunked = jax.tree.map(
            lambda a: a.reshape((B // ic, ic) + a.shape[1:]), xs_tree)
        out = jax.lax.map(jax.vmap(per_image), chunked)
        return out.reshape((B, R, P, P) + out.shape[-1:])
    return jax.lax.map(per_image, xs_tree)


def _roi_align_gather(feats, boxes, lvl, out_size, sampling, min_level,
                      chunk: int = 0):
    """Gather path: flattened multi-level lookup (large feature maps)."""
    B, _, _, C = feats[0].shape
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum([h * w for h, w in sizes])]),
        jnp.int32)
    strides = jnp.asarray([2 ** (min_level + i) for i in range(len(feats))],
                          jnp.float32)
    Hs = jnp.asarray([h for h, _ in sizes], jnp.float32)
    Ws = jnp.asarray([w for _, w in sizes], jnp.float32)

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
            bw = (bxs[:, 2] - bxs[:, 0]) / out_size
            bh = (bxs[:, 3] - bxs[:, 1]) / out_size
            sx = (bxs[:, 0:1] + u[None, :] * bw[:, None]) / stride[:, None] \
                - 0.5
            sy = (bxs[:, 1:2] + u[None, :] * bh[:, None]) / stride[:, None] \
                - 0.5
            ix0, ix1, wx0, wx1, vx = _interp_weights(sx, Wl[:, None])
            iy0, iy1, wy0, wy1, vy = _interp_weights(sy, Hl[:, None])
            wx0 = jnp.where(vx, wx0, 0.0)
            wx1 = jnp.where(vx, wx1, 0.0)
            wy0 = jnp.where(vy, wy0, 0.0)
            wy1 = jnp.where(vy, wy1, 0.0)
            Wi = Wl.astype(jnp.int32)

            def corner(iy, wy, ix, wx):
                idx = (off[:, None, None]
                       + iy[:, :, None] * Wi[:, None, None]
                       + ix[:, None, :])                      # (K, S, S)
                vals = jnp.take(flat_i, idx.reshape(-1), axis=0)
                vals = vals.reshape(idx.shape + (C,))
                w = (wy[:, :, None] * wx[:, None, :]).astype(fdt)
                return vals * w[..., None]

            acc = (corner(iy0, wy0, ix0, wx0) + corner(iy0, wy0, ix1, wx1)
                   + corner(iy1, wy1, ix0, wx0) + corner(iy1, wy1, ix1, wx1))
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


def roi_align_multilevel(feats: list, boxes: jnp.ndarray, out_size: int,
                         sampling: int = 2, canonical_size: int = 224,
                         canonical_level: int = 4, min_level: int = 2,
                         max_level: int = 5, chunk: int = 0) -> jnp.ndarray:
    """feats: [P2..P5] NHWC tensors; boxes: (B, R, 4) XYXY in image coords.

    Returns (B, R, out_size, out_size, C) float32 pooled features.
    """
    lvl = _level_assignment(boxes, canonical_size, canonical_level,
                            min_level, max_level)
    if feats[0].shape[1] * feats[0].shape[2] <= _MATMUL_PATH_MAX_HW:
        return _roi_align_separable(feats, boxes, lvl, out_size, sampling,
                                    min_level)
    return _roi_align_gather(feats, boxes, lvl, out_size, sampling,
                             min_level, chunk)
