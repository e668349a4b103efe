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


import os

import jax
import jax.numpy as jnp
import numpy as np

# feature maps up to this many pixels use the separable-matmul path
_MATMUL_PATH_MAX_HW = 160 * 160

# static sample slots for POOLER_SAMPLING_RATIO=0 (adaptive) semantics:
# per-ROI n = ceil(bin size in cells) is masked into this many slots.
# The detectron2 CUDA op has no cap; n > 4 occurs for boxes whose aspect
# ratio exceeds ~2:1 at their assigned FPN level AND for large boxes
# clamped at the top level (a full 800x1333 image at P5 needs
# n = ceil((1333/7)/32) = 6, the worst case under MAX_SIZE_TEST=1333).
# 6 slots therefore cover every reachable geometry of the parity profile;
# parity vs torchvision is asserted in tests/test_torch_parity.py.
_ADAPTIVE_MAX = 6


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
    half-pixel-aligned sample points. Built in closed form —
    ``w(d) = Σ_s valid_s · max(0, 1 − |clamp(c_s) − d|) / sampling`` —
    instead of scattering one-hot tap tensors: the tent function at
    integer d reproduces _interp_weights exactly (interior taps get
    (1−frac, frac); border-clamped samples collapse both taps onto the
    edge index with total weight 1), at 1/sampling·4 of the temporary
    footprint (the one-hot build was ~40% of the pooler's HBM traffic).
    """
    if sampling == 0:
        return _axis_weight_matrix_adaptive(lo, bin_size, dim, stride,
                                            out_size)
    B, R = lo.shape
    p = jnp.arange(out_size, dtype=jnp.float32)
    d = jnp.arange(dim, dtype=jnp.float32)
    m = jnp.zeros((B, R, out_size, dim), jnp.float32)
    for s in range(sampling):
        # (B, R, P): sample coordinate in feature-cell units
        u = (s + 0.5) / sampling
        c = (lo[..., None] + (p + u) * bin_size[..., None]) / stride - 0.5
        valid = (c >= -1.0) & (c <= float(dim))
        cc = jnp.clip(c, 0.0, float(dim) - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - d))
        m = m + jnp.where(valid[..., None], w, 0.0)
    return m / sampling


def _axis_weight_matrix_adaptive(lo, bin_size, dim: int, stride: float,
                                 out_size: int):
    """Exact POOLER_SAMPLING_RATIO=0 weights at every cell of the axis."""
    d = jnp.arange(dim, dtype=jnp.float32)
    return _axis_weights_adaptive_at(lo, bin_size, d, dim, stride, out_size)


def _axis_weights_adaptive_at(lo, bin_size, d, dim, stride, out_size: int):
    """Exact POOLER_SAMPLING_RATIO=0 weights in closed form, uncapped,
    evaluated at arbitrary cell positions ``d``.

    Adaptive sampling places n = ceil(bin cells) uniform samples per bin
    (spacing δ = bin/n), so the per-cell tent sum
    ``Σ_i max(0, 1 − |clamp(c_i) − d|)`` sums a piecewise-linear function
    over an arithmetic progression — each linear segment is a closed-form
    arithmetic series. No per-sample loop, no cap: matches the detectron2
    CUDA op for ANY n (a masked-slot scheme would need unbounded static
    slots for elongated ROIs). Border clamping is a correction on cells 0
    and dim−1, where valid out-of-range samples (c ∈ [−1, 0) or
    (dim−1, dim]) collapse onto the edge cell with weight 1.

    ``d``: float cell indices, (dim,) for the dense matrix or (B, R, N)
    per-ROI positions (the rectangle-gather path); ``dim``/``stride`` are
    scalars or (B, R) per-ROI arrays. Positions outside [0, dim) return
    weight 0. Result broadcasts to (B, R, out_size, d[-1]).
    """
    P = out_size
    p = jnp.arange(P, dtype=jnp.float32)
    if d.ndim > 1:
        d = d[..., None, :]                                   # (B, R, 1, N)
    dim = jnp.asarray(dim, jnp.float32)
    if dim.ndim:
        dim = dim[..., None, None]                            # (B, R, 1, 1)
    if not isinstance(stride, float):
        stride = stride[..., None]                            # (B, R, 1)

    bins = bin_size[..., None] / stride                       # (B, R, P|1)
    n = jnp.maximum(jnp.ceil(bins), 1.0)
    delta_t = bins / n                                        # true spacing
    delta = jnp.where(delta_t > 0, delta_t, 1.0)              # guarded
    # c_i = A + (i + 0.5)·delta reproduces the true samples (A absorbs
    # the guard shift for degenerate zero-size bins)
    A = (lo[..., None] + p * bin_size[..., None]) / stride - 0.5 \
        + 0.5 * (delta_t - delta)                             # (B, R, P)
    A = A[..., None]                                          # (B, R, P, 1)
    nn = n[..., None]                                         # (B, R, 1, 1)
    dl = delta[..., None]

    def t(x):
        # i-coordinate of position x: c_i <= x  <=>  i <= t(x)
        return (x - A) / dl - 0.5

    def series(i0, i1):
        """(count, Σ c_i) over integer i ∈ [i0, i1] ∩ [0, n−1]."""
        i0c = jnp.maximum(i0, 0.0)
        i1c = jnp.minimum(i1, nn - 1.0)
        m = jnp.maximum(i1c - i0c + 1.0, 0.0)
        si = 0.5 * (i0c + i1c) * m                  # Σ i (arith. series)
        return m, jnp.where(m > 0, m * (A + 0.5 * dl) + dl * si, 0.0)

    # window (d−1, d]: tent rises, sample weight c − (d−1)
    hi1 = jnp.floor(t(d))
    m1, s1 = series(jnp.floor(t(d - 1.0)) + 1.0, hi1)
    part1 = s1 - m1 * (d - 1.0)
    # window (d, d+1]: tent falls, weight (d+1) − c  (c = d+1 adds 0)
    m2, s2 = series(hi1 + 1.0, jnp.floor(t(d + 1.0)))
    part2 = m2 * (d + 1.0) - s2

    # border corrections: replace the unclamped tent of valid samples
    # beyond the edges with the clamped weight 1
    mb0, sb0 = series(jnp.ceil(t(-1.0)),                      # c >= -1
                      jnp.ceil(t(0.0)) - 1.0)                 # c < 0
    corr0 = mb0 - (sb0 + mb0)                                 # 1 − (1 + c)
    mbt, sbt = series(jnp.floor(t(dim - 1.0)) + 1.0,          # c > dim−1
                      jnp.floor(t(dim)))                      # c <= dim
    corrt = sbt - mbt * (dim - 1.0)                           # c − (dim−1)

    w = part1 + part2
    w = w + jnp.where(d == 0.0, corr0, 0.0)
    w = w + jnp.where(d == dim - 1.0, corrt, 0.0)
    return jnp.where((d >= 0.0) & (d <= dim - 1.0), w / nn, 0.0)


def _axis_weights_at(lo, bin_size, d, dim, stride, out_size: int,
                     sampling: int):
    """Per-ROI axis weights at arbitrary cell positions ``d`` (B, R, N);
    ``dim``/``stride`` are (B, R) per-ROI arrays (the ROI's assigned
    level). Returns (B, R, out_size, N); positions outside [0, dim) get
    weight 0. Fixed-``sampling`` tent sum, or the exact closed-form
    adaptive series for ``sampling == 0``."""
    if sampling == 0:
        return _axis_weights_adaptive_at(lo, bin_size, d, dim, stride,
                                         out_size)
    P = out_size
    p = jnp.arange(P, dtype=jnp.float32)
    dd = d[..., None, :]                                      # (B, R, 1, N)
    dimb = dim[..., None, None]
    m = jnp.zeros(dd.shape[:-2] + (P, dd.shape[-1]), jnp.float32)
    for s in range(sampling):
        u = (s + 0.5) / sampling
        c = (lo[..., None] + (p + u) * bin_size[..., None]) \
            / stride[..., None] - 0.5                          # (B, R, P)
        valid = (c >= -1.0) & (c <= dimb[..., 0])
        cc = jnp.clip(c, 0.0, dimb[..., 0] - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - dd))
        m = m + jnp.where(valid[..., None], w, 0.0)
    return jnp.where((dd >= 0.0) & (dd <= dimb - 1.0), m / sampling, 0.0)


def _rect_slot_budget(sizes, canonical_size: int, canonical_level: int,
                      min_level: int) -> int:
    """Static per-ROI cell budget for the rectangle-gather path.

    The FPN level assignment bounds each ROI's footprint at its assigned
    level: a box lands at level l (below the top) only while
    sqrt(area) < canonical_size·2^(l−canonical_level+1) px, so its cell
    count area/4^l is < canonical²·4^(1−canonical_level) — independent of
    l (784 cells for the 224/4 defaults). At the clamped top level the
    image clip bounds it by H_top·W_top. The bilinear taps add ≤ 2 cells
    per axis; with span_y·span_x ≤ A and span_y ≤ H, span_x ≤ W the
    padded product (span_y+2)(span_x+2) maximizes at an endpoint of the
    hyperbola — scanned numerically below.
    """
    prod_nontop = float(canonical_size ** 2) * 4.0 ** (1 - canonical_level)
    worst = 0.0
    for li, (H, W) in enumerate(sizes):
        a_bound = float(H * W) if li == len(sizes) - 1 else prod_nontop
        for sy in (1.0, a_bound / W, np.sqrt(a_bound), float(H)):
            sy = min(max(sy, 1.0), float(H), a_bound)
            sx = min(a_bound / sy, float(W))
            worst = max(worst, (sy + 2.0) * (sx + 2.0))
    return int(-(-worst // 128) * 128)


def _roi_align_rect_gather(feats, boxes, lvl, out_size, sampling, min_level,
                           canonical_size=224, canonical_level=4):
    """Exact rectangle-gather path for large feature maps (800px parity).

    The separable-matmul path materializes a (R, P, W, C) intermediate per
    level per image (~1.3 GB/image at 800px/R=1000) and contracts every
    ROI against every level's full width — ~43 GB of HBM traffic per
    batch-16. This path instead gathers, per ROI, ONLY the feature cells
    its bilinear taps touch: the level assignment bounds that rectangle's
    area (see :func:`_rect_slot_budget`, ~1.2k cells at 800px) even though
    either axis alone is unbounded (elongated road boxes). Each ROI's
    rectangle is enumerated into a static slot budget, gathered from its
    assigned level, and contracted against the exact closed-form weights
    evaluated at the gathered cell positions — same semantics as the
    separable path (asserted in tests/test_model.py), ~5× less traffic.
    """
    B, R = boxes.shape[:2]
    P = out_size
    C = feats[0].shape[-1]
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    N = _rect_slot_budget(sizes, canonical_size, canonical_level, min_level)

    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    offs_np = np.concatenate(
        [[0], np.cumsum([h * w for h, w in sizes])]).astype(np.int32)
    stride = jnp.asarray([2.0 ** (min_level + i) for i in range(len(feats))],
                         jnp.float32)[lvl]                    # (B, R)
    Hl = jnp.asarray([h for h, _ in sizes], jnp.float32)[lvl]
    Wl = jnp.asarray([w for _, w in sizes], jnp.float32)[lvl]
    off = jnp.asarray(offs_np[:-1], jnp.int32)[lvl]

    x0, y0 = boxes[..., 0], boxes[..., 1]
    x1, y1 = boxes[..., 2], boxes[..., 3]

    def tap_range(a0, a1, dim):
        # tap cells span [floor(c_first), floor(c_last)+1] clamped; the
        # sample train lies inside [a0/stride−0.5, a1/stride−0.5]
        t0 = jnp.clip(jnp.floor(a0 / stride - 0.5), 0.0, dim - 1.0)
        t1 = jnp.clip(jnp.floor(a1 / stride - 0.5) + 1.0, 0.0, dim - 1.0)
        return t0, (t1 - t0).astype(jnp.int32) + 1

    t0y, hy = tap_range(y0, y1, Hl)
    t0x, wx = tap_range(x0, x1, Wl)

    # slot k -> (ky, kx) = (k // wx, k % wx), exact via f32 reciprocal
    # plus one integer correction step (k, wx <= a few thousand)
    k = jnp.arange(N, dtype=jnp.int32)
    ky = jnp.floor((k.astype(jnp.float32) + 0.5)
                   * (1.0 / wx.astype(jnp.float32))[..., None]
                   ).astype(jnp.int32)                        # (B, R, N)
    rem = k - ky * wx[..., None]
    ky = ky + (rem >= wx[..., None]) - (rem < 0)
    kx = k - ky * wx[..., None]
    valid = ky < hy[..., None]
    dy = t0y[..., None].astype(jnp.int32) + ky
    dx = t0x[..., None].astype(jnp.int32) + kx
    idx = jnp.where(valid,
                    off[..., None] + dy * Wl.astype(jnp.int32)[..., None]
                    + dx, 0)

    bh = (y1 - y0) / P
    bw = (x1 - x0) / P
    wyv = _axis_weights_at(y0, bh, dy.astype(jnp.float32), Hl, stride, P,
                           sampling)
    wxv = _axis_weights_at(x0, bw, dx.astype(jnp.float32), Wl, stride, P,
                           sampling)
    wyv = jnp.where(valid[..., None, :], wyv, 0.0).astype(flat.dtype)
    wxv = wxv.astype(flat.dtype)

    def per_image(args):
        flat_i, idx_i, wy_i, wx_i = args
        G = jnp.take(flat_i, idx_i.reshape(-1), axis=0)
        G = G.reshape(idx_i.shape + (C,))                     # (R, N, C)
        w2 = wy_i[:, :, None, :] * wx_i[:, None, :, :]        # (R, P, P, N)
        return jnp.einsum("rpqn,rnc->rpqc", w2, G,
                          preferred_element_type=jnp.float32)

    return jax.lax.map(per_image, (flat, idx, wyv, wxv))


def _roi_align_separable(feats, boxes, lvl, out_size, sampling, min_level,
                         img_chunk: int = 0):
    """MXU path: per-level separable interpolation matmuls, levels summed.

    ``img_chunk=0`` picks the chunk size from the t1 working set: tile-
    scale maps (≤160²) process 4 images per lax.map step; the 800px parity
    maps drop to 1 image per step so the (R, P, W, C) separable
    intermediate stays a bounded transient (~0.7 GB at P2/R=1000)."""
    if img_chunk == 0:
        hw = feats[0].shape[1] * feats[0].shape[2]
        img_chunk = 4 if hw <= _MATMUL_PATH_MAX_HW else 1
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
            # t1 stays in the feature dtype (bf16 on the inference path):
            # it is the pooler's dominant HBM round-trip
            t1 = jnp.einsum("rph,hwc->rpwc", wy_b.astype(f_b.dtype), f_b)
            return jnp.einsum("rpwc,rqw->rpqc", t1,
                              wx_b.astype(t1.dtype),
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

    smp = sampling if sampling > 0 else _ADAPTIVE_MAX
    S = out_size * smp
    pgrid = jnp.repeat(jnp.arange(out_size, dtype=jnp.float32), smp)
    sgrid = jnp.tile(jnp.arange(smp, dtype=jnp.float32) + 0.5, out_size)

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
            if sampling > 0:
                nx = jnp.full_like(bw, float(sampling))
                ny = jnp.full_like(bh, float(sampling))
            else:
                # adaptive: n = ceil(bin cells), masked into smp slots
                nx = jnp.clip(jnp.ceil(bw / stride), 1.0, float(smp))
                ny = jnp.clip(jnp.ceil(bh / stride), 1.0, float(smp))
            ux = pgrid[None, :] + sgrid[None, :] / nx[:, None]   # (K, S)
            uy = pgrid[None, :] + sgrid[None, :] / ny[:, None]
            mx = sgrid[None, :] - 0.5 < nx[:, None]
            my = sgrid[None, :] - 0.5 < ny[:, None]
            sx = (bxs[:, 0:1] + ux * bw[:, None]) / stride[:, None] - 0.5
            sy = (bxs[:, 1:2] + uy * bh[:, None]) / stride[:, None] - 0.5
            ix0, ix1, wx0, wx1, vx = _interp_weights(sx, Wl[:, None])
            iy0, iy1, wy0, wy1, vy = _interp_weights(sy, Hl[:, None])
            wx0 = jnp.where(vx & mx, wx0, 0.0)
            wx1 = jnp.where(vx & mx, wx1, 0.0)
            wy0 = jnp.where(vy & my, wy0, 0.0)
            wy1 = jnp.where(vy & my, wy1, 0.0)
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
            acc = acc.reshape(K, out_size, smp, out_size, smp, C)
            return acc.astype(jnp.float32).sum(axis=(2, 4)) \
                / (ny * nx)[:, None, None, None]

        R = boxes_i.shape[0]
        if chunk and R % chunk == 0 and R > chunk:
            n = R // chunk
            out = jax.lax.map(per_chunk,
                              (boxes_i.reshape(n, chunk, 4),
                               lvl_i.reshape(n, chunk)))
            return out.reshape(R, out_size, out_size, C)
        return per_chunk((boxes_i, lvl_i))

    return jax.vmap(per_image)(flat, boxes, lvl)


def reachable_levels(feats: list, canonical_size: int = 224,
                     canonical_level: int = 4, min_level: int = 2) -> int:
    """Number of FPN levels a box can actually be assigned to.

    Boxes are clipped to the image, so sqrt(area) <= sqrt(H*W) and the
    level assignment (canonical_level + log2(sqrt(area)/canonical_size))
    is bounded: at 256px only P2..P4 are reachable — computing P5's masked
    contribution would be pure waste. Both padded dims participate so
    non-square images (aspect > 2:1) don't under-count the top level.
    """
    S = float(np.sqrt(float(feats[0].shape[1]) * float(feats[0].shape[2]))) \
        * 2 ** min_level
    top = int(np.floor(canonical_level
                       + np.log2(max(S, 1) / canonical_size + 1e-8)))
    return min(len(feats), max(1, top - min_level + 1))


def roi_align_multilevel(feats: list, boxes: jnp.ndarray, out_size: int,
                         sampling: int = 2, canonical_size: int = 224,
                         canonical_level: int = 4, min_level: int = 2,
                         max_level: int = 5, chunk: int = 0,
                         use_pallas: bool = False,
                         use_gather: bool = False,
                         feat_scales=None) -> jnp.ndarray:
    """feats: [P2..P5] NHWC tensors; boxes: (B, R, 4) XYXY in image coords.

    Returns (B, R, out_size, out_size, C) float32 pooled features.
    ``sampling=0`` selects POOLER_SAMPLING_RATIO=0 adaptive semantics
    (per-ROI ceil(bin cells), the reference's pinned configuration) — the
    separable path computes it EXACTLY for any n via the closed-form
    series; the legacy gather path (``use_gather``, kept as a test oracle)
    caps the sample train at _ADAPTIVE_MAX slots.
    ``use_pallas`` selects the fused TPU kernel (inference path on real
    TPU; no VJP, so training keeps the XLA formulations).
    ``feat_scales`` (n_levels,) marks ``feats`` as int8 pyramid levels
    (cfg.int8_pyramid): the fused kernel folds each level's scale into
    its interpolation weights (the int8 HBM reads halve the pooler's DMA
    traffic); the XLA paths dequantize up front.
    """
    n_lev = reachable_levels(feats, canonical_size, canonical_level,
                             min_level)
    feats = list(feats[:n_lev])
    if use_pallas and sampling > 0 and feats[0].shape[1] * feats[0].shape[2] \
            <= _MATMUL_PATH_MAX_HW:
        from .roi_align_pallas import pick_gb, roi_align_fused
        # group images per kernel program: the per-program fixed cost
        # (~10-30 us grid-step setup) dominates the deployment shapes'
        # kernel time at batch 512 (scripts/bench_pooler_variants.py);
        # gb is capped by an explicit VMEM estimate (bf16 pyramids with
        # the P=14 mask pooler don't fit gb=8)
        B = boxes.shape[0]
        gb_env = os.environ.get("RS_POOLER_GB", "")
        if gb_env:
            gb = int(gb_env) if B % max(int(gb_env), 1) == 0 else 1
        else:
            gb = pick_gb(B, boxes.shape[1], out_size,
                         [(f.shape[1], f.shape[2]) for f in feats],
                         feats[0].shape[-1],
                         1 if feat_scales is not None
                         else feats[0].dtype.itemsize)
        return roi_align_fused(tuple(feats), boxes, out_size,
                               sampling=sampling,
                               canonical_size=canonical_size,
                               canonical_level=canonical_level,
                               min_level=min_level,
                               feat_scales=feat_scales, gb=gb)
    if use_pallas and not use_gather and feats[0].shape[1] \
            * feats[0].shape[2] > _MATMUL_PATH_MAX_HW:
        # the blocked 800px kernel consumes int8 pyramid levels directly
        # (feat_scales folded into the accumulated rows) — no upfront
        # dequantized copy of the large maps
        from .roi_align_pallas import roi_align_fused_blocked
        return roi_align_fused_blocked(tuple(feats), boxes, out_size,
                                       sampling=sampling,
                                       canonical_size=canonical_size,
                                       canonical_level=canonical_level,
                                       min_level=min_level,
                                       feat_scales=feat_scales)
    if feat_scales is not None:
        # fallback paths (adaptive sampling, XLA separable, gather oracle)
        # dequantize up front — to bf16, not f32: the copies are pure HBM
        # ballast (4x the int8 footprint in f32) and every consumer casts
        # to compute dtype anyway (advisor r3 finding)
        scl = jnp.asarray(feat_scales, jnp.float32)
        feats = [(f.astype(jnp.float32) * scl[i]).astype(jnp.bfloat16)
                 for i, f in enumerate(feats)]
    lvl = _level_assignment(boxes, canonical_size, canonical_level,
                            min_level, min_level + n_lev - 1)
    if use_gather:
        return _roi_align_gather(feats, boxes, lvl, out_size, sampling,
                                 min_level, chunk)
    return _roi_align_separable(feats, boxes, lvl, out_size, sampling,
                                min_level)
