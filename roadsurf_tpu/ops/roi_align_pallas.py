"""Fused multilevel RoIAlign as a Pallas TPU kernel.

Replaces the XLA separable-matmul path of ``ops/roi_align.py`` on TPU for
tile-sized feature maps. The XLA formulation materializes the separable
intermediate ``t1 (B, R, P, W, C)`` plus one-hot interpolation-weight
tensors in HBM (~4.4 GB of temporaries at batch 512 — measured via
``compile().memory_analysis()``), making the box-head pooler HBM-bound at
~150 ms/batch. This kernel keeps everything on-chip:

* bilinear weights are built in VMEM in closed form —
  ``w(h) = Σ_s valid_s · max(0, 1 − |clamp(c_s) − h|) / sampling`` over an
  iota grid (no one-hot tensors; exact ROIAlignV2 border-clamp semantics of
  ``ops/roi_align._interp_weights``). Per-ROI scalars arrive pre-expanded
  to (bin, roi)-ordered rows because Mosaic cannot expand scalars across
  the sublane dim in-kernel;
* the y-contraction is one dense MXU matmul per level/w-block
  ``wy (P·RB, H) × f (H, Wb·C)`` whose output never leaves VMEM;
* the (p,r)×(w,c) → (w,r)×(p,c) relayout between the two contractions is
  done as P·Wb static contiguous (RB, C) block copies through a VMEM
  scratch — a Mosaic value-transpose here costs ~150 ms/batch (measured);
  the copies never cross the sublane/lane boundary;
* the per-ROI x-contraction is packed into a single block-diagonal MXU
  matmul ``WX (Q·RB, Wb·RB) × t1ᵀ (Wb·RB, P·C)`` instead of R tiny
  (7×W) matmuls that would pad 7→128 MXU rows.

Semantics pinned by the reference's detectron2 CUDA op
(detectron2_config_3bands.yaml:174,221 — ROIAlignV2, aligned=True,
pooler resolutions 7/14); parity vs the XLA path is asserted in
tests/test_model.py (interpret mode) and on real TPU via the bench path.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(sizes, strides, P, RB, C, sampling, wb_sizes, out_dtype,
                 wb_offs, rbx=None, stage="full", scaled=False, gb=1,
                 relayout="copy"):
    """rbx: ROI sub-block size for the x-contraction. The block-diagonal
    x-matmul computes (P·RB)×(Wb·RB)×(P·C) flops of which only 1/RB are
    useful (the off-diagonal ROI pairs are zeros); splitting the ROI axis
    into RB/rbx independent sub-blocks cuts that waste to 1/rbx — at
    RB=32/rbx=8 the box pooler's x-flops drop 4×. Row order becomes
    (sub, bin, roi) so every sub-block is a contiguous row range of wy,
    t1, t1t and acc.

    Each (level, w-block) body is gated by a scalar-prefetched touch bit
    (any ROI of this block assigned to the level AND x-overlapping the
    w-block): deployment ROIs are small road boxes concentrated on P2,
    so most of the (level, w-block) grid contributes only zeros — the
    accumulator lives in a VMEM scratch so skipped bodies cost nothing.

    stage: profiling knob ("y" y-matmul only / "yr" +relayout / "full")
    — non-"full" stages produce WRONG results and exist purely to
    attribute kernel time (scripts/bench_pooler_variants)."""
    RBX = rbx or RB
    S = RB // RBX

    def kernel(bits_ref, cols_ref, *refs):
        feat_refs = refs[:-3]
        out_ref, t1t_ref, acc_ref = refs[-3], refs[-2], refs[-1]
        bg = pl.program_id(0)
        j = pl.program_id(1)
        rows = P * RB                              # row order (sub, bin, r)

        # gb > 1: each program handles a GROUP of gb images through one
        # fori_loop — the per-program fixed cost (grid-step setup, DMA
        # orchestration) is ~10-30 us on v5e, i.e. 5-15 ms across a
        # 512-image batch of single-image programs; grouping amortizes it
        # gb-fold while the instruction count stays flat (g is a dynamic
        # index, not an unroll).
        def g_body(g, _):
            b = bg * gb + g
            cols = cols_ref[0, pl.ds(g * rows, rows), :]    # (rows, 8) f32
            x0r = cols[:, 0:1]
            bwr = cols[:, 1:2]
            y0r = cols[:, 2:3]
            bhr = cols[:, 3:4]
            lvlr = cols[:, 4:5]
            rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            binf = ((rowi // RBX) % P).astype(jnp.float32)  # bin per row

            # accumulator scratch, rows (sub, q=x-bin, r'), zeroed per image
            acc_ref[...] = jnp.zeros((rows, P * C), jnp.float32)

            for li, ((H, W), stride) in enumerate(zip(sizes, strides)):
                Wb = wb_sizes[li]
                f = feat_refs[li][g]                    # (H, W*C) lane-flat

                # y-axis weights, rows (sub, p, r): closed-form ROIAlignV2
                # taps
                h = jax.lax.broadcasted_iota(jnp.int32, (rows, H), 1
                                             ).astype(jnp.float32)
                wy = jnp.zeros((rows, H), jnp.float32)
                for s in range(sampling):
                    c = (y0r + (binf + (s + 0.5) / sampling) * bhr) / stride \
                        - 0.5
                    valid = (c >= -1.0) & (c <= float(H))
                    cc = jnp.clip(c, 0.0, float(H) - 1.0)
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - h))
                    wy = wy + jnp.where(valid, w, 0.0)
                wy = jnp.where(lvlr == float(li), wy / sampling, 0.0)
                if scaled:
                    # int8 pyramid levels: fold the row's per-level
                    # dequantization scale (cols slot 5) into the y-weights
                    # — rows of other levels are already zeroed, so the row
                    # scale applies exactly once per pooled value
                    wy = wy * cols[:, 5:6]
                wy = wy.astype(jnp.bfloat16)

                # block-diagonal x-weight scaffolding per sub-block, cols
                # indexed (w, r') within the sub
                srows = P * RBX
                col_w = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, Wb * RBX), 1) // RBX
                col_r = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, Wb * RBX), 1) % RBX
                row_r = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, Wb * RBX), 0) % RBX
                w_off = col_w.astype(jnp.float32)
                diag = row_r == col_r

                for wbi in range(W // Wb):
                    @pl.when(bits_ref[b, j, wb_offs[li] + wbi] != 0)
                    def _wb_body(f=f, wy=wy, wbi=wbi, Wb=Wb, W=W,
                                 stride=stride, w_off=w_off, diag=diag,
                                 srows=srows, x0r=x0r, bwr=bwr, binf=binf):
                        w0 = wbi * Wb
                        # t1 = wy @ f[:, w-block] -> (P*RB, Wb*C), rows
                        # (sub, p, r); the w-block is a pure lane slice of
                        # the (H, W*C) layout
                        fb = f[:, w0 * C:(w0 + Wb) * C]
                        t1 = jax.lax.dot_general(
                            wy, fb.astype(jnp.bfloat16),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
                        if stage == "y":
                            acc_ref[:P * RBX, :] = acc_ref[:P * RBX, :] \
                                + t1[:P * RBX, :P * C].astype(jnp.float32)
                            return
        # relayout rows (s,p,r') x cols (w,c) -> rows
                        # (s,w,r') x cols (p,c): either S*P*Wb static
                        # contiguous (RBX, C) block copies (the measured-
                        # safe default) or one Mosaic value-transpose of
                        # the (p, w) dims (stage/mode "t": the copy loop
                        # is instruction-issue-bound at ~1k vector ops
                        # per w-block body; Mosaic's native shuffle
                        # lowering can beat it — measured via
                        # scripts/bench_pooler_variants.py)
                        if relayout == "t":
                            t1t_ref[:S * Wb * RBX, :] = (
                                t1.reshape(S, P, RBX, Wb, C)
                                .transpose(0, 3, 2, 1, 4)
                                .reshape(S * Wb * RBX, P * C))
                        else:
                            for sb in range(S):
                                for p in range(P):
                                    tp = t1[(sb * P + p) * RBX:
                                            (sb * P + p + 1) * RBX]
                                    for w in range(Wb):
                                        t1t_ref[(sb * Wb + w) * RBX:
                                                (sb * Wb + w + 1) * RBX,
                                                p * C:(p + 1) * C] = \
                                            tp[:, w * C:(w + 1) * C]
                        if stage == "yr":
                            acc_ref[:P * RBX, :] = acc_ref[:P * RBX, :] \
                                + t1t_ref[:P * RBX, :P * C].astype(
                                    jnp.float32)
                            return

                        for sb in range(S):
                            r0 = sb * srows
                            wxbd = jnp.zeros((srows, Wb * RBX), jnp.float32)
                            for s in range(sampling):
                                c = (x0r[r0:r0 + srows]
                                     + (binf[r0:r0 + srows]
                                        + (s + 0.5) / sampling)
                                     * bwr[r0:r0 + srows]) / stride - 0.5
                                valid = (c >= -1.0) & (c <= float(W))
                                cc = jnp.clip(c, 0.0, float(W) - 1.0)
                                w = jnp.maximum(
                                    0.0, 1.0 - jnp.abs(cc - (w_off + w0)))
                                wxbd = wxbd + jnp.where(valid & diag, w, 0.0)
                            wxbd = (wxbd / sampling).astype(jnp.bfloat16)

                            part = jax.lax.dot_general(
                                wxbd,
                                t1t_ref[sb * Wb * RBX:(sb + 1) * Wb * RBX,
                                        :],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            acc_ref[r0:r0 + srows, :] = \
                                acc_ref[r0:r0 + srows, :] + part

            # acc rows (sub, q=x-bin, r'), cols (p=y-bin, c); out rows
            # r = sub*RBX + r', flat cols (p, q, c) — static (RBX, C)
            # copies per image g
            for sb in range(S):
                accv = acc_ref[sb * P * RBX:(sb + 1) * P * RBX, :].astype(
                    out_dtype)
                for q in range(P):
                    blk = accv[q * RBX:(q + 1) * RBX]   # (RBX, P*C)
                    for p in range(P):
                        out_ref[g, sb * RBX:(sb + 1) * RBX,
                                (p * P + q) * C:(p * P + q + 1) * C] = \
                            blk[:, p * C:(p + 1) * C]
            return 0

        if gb == 1:
            g_body(0, 0)
        else:
            jax.lax.fori_loop(0, gb, g_body, 0)

    return kernel


def pick_rb(R: int, P: int = 7) -> int:
    # Mosaic block constraint: the (1, RB, P*P*C) out block needs RB % 8
    # == 0 (sublane divisibility); callers pad R so a valid RB exists.
    # Cap P*RB so the in-kernel working set (acc, t1, t1t, out all scale
    # with RB; several scale with P or P^2) stays inside VMEM.
    cap = max(8, 448 // P)
    for rb in (64, 32, 16, 8):
        if rb <= cap and R % rb == 0:
            return rb
    return 0


def pick_gb(B: int, R: int, P: int, sizes, C: int,
            feat_itemsize: int, out_itemsize: int = 2,
            budget_bytes: int = 85 * 1024 * 1024) -> int:
    """Largest image-group size per kernel program that fits in VMEM.

    Grouping gb images per program amortizes the ~10-30 us grid-step
    fixed cost, but multiplies the program's resident set: the cols
    block, every level's feature block, and the out block all scale
    with gb (and in/out blocks are double-buffered by the pipeline).
    Choosing gb purely from batch divisibility can exceed
    vmem_limit_bytes on bf16 pyramids with the P=14 mask pooler —
    estimate the set explicitly and take the largest (8, 4, 2) that
    divides B AND fits (advisor r4 finding)."""
    Rp = R if pick_rb(R, P) else ((R + 31) // 32) * 32
    RB = pick_rb(Rp, P)
    if RB == 0:
        return 1
    feat_cells = sum(h * w for h, w in sizes) * C
    wb_max = max(max(d for d in range(1, 17) if w % d == 0)
                 for _, w in sizes)
    scratch = wb_max * RB * P * C * 2 + P * RB * P * C * 4
    for gb in (8, 4, 2):
        if B % gb:
            continue
        per_gb = (2 * P * RB * 8 * 4                  # cols (dbuf)
                  + 2 * feat_cells * feat_itemsize    # levels (dbuf)
                  + 2 * RB * P * P * C * out_itemsize)  # out (dbuf)
        if scratch + gb * per_gb <= budget_bytes:
            return gb
    return 1


def _adaptive_weights_rows(lo, bins, binf, d, dim: float):
    """Closed-form POOLER_SAMPLING_RATIO=0 weights, in-kernel form.

    Per-row scalars lo/bins (ROI edge and bin size, feature cells,
    (rows, 1)), binf (bin index per row), evaluated at cell positions
    ``d`` (rows, X). Same series as ops/roi_align._axis_weights_adaptive_at
    (see its derivation); elementwise VPU ops only.
    """
    n = jnp.maximum(jnp.ceil(bins), 1.0)
    delta_t = bins / n
    delta = jnp.where(delta_t > 0, delta_t, 1.0)
    A = lo + binf * bins - 0.5 + 0.5 * (delta_t - delta)      # (rows, 1)

    def t(x):
        return (x - A) / delta - 0.5

    def series(i0, i1):
        i0c = jnp.maximum(i0, 0.0)
        i1c = jnp.minimum(i1, n - 1.0)
        m = jnp.maximum(i1c - i0c + 1.0, 0.0)
        si = 0.5 * (i0c + i1c) * m
        return m, jnp.where(m > 0, m * (A + 0.5 * delta) + delta * si, 0.0)

    hi1 = jnp.floor(t(d))
    m1, s1 = series(jnp.floor(t(d - 1.0)) + 1.0, hi1)
    part1 = s1 - m1 * (d - 1.0)
    m2, s2 = series(hi1 + 1.0, jnp.floor(t(d + 1.0)))
    part2 = m2 * (d + 1.0) - s2
    mb0, sb0 = series(jnp.ceil(t(-1.0)), jnp.ceil(t(0.0)) - 1.0)
    corr0 = -sb0
    mbt, sbt = series(jnp.floor(t(dim - 1.0)) + 1.0, jnp.floor(t(dim)))
    corrt = sbt - mbt * (dim - 1.0)
    w = part1 + part2
    w = w + jnp.where(d == 0.0, corr0, 0.0)
    w = w + jnp.where(d == dim - 1.0, corrt, 0.0)
    return jnp.where((d >= 0.0) & (d <= dim - 1.0), w / n, 0.0)


def _axis_rows_weights(lo_px, bin_px, binf, d, stride: float, dim: int,
                       sampling: int):
    """Dispatch: tent-loop for fixed ``sampling``, closed-form series for
    adaptive (0). lo_px/bin_px in image pixels, (rows, 1)."""
    if sampling == 0:
        return _adaptive_weights_rows(lo_px / stride, bin_px / stride,
                                      binf, d, float(dim))
    w_sum = None
    for s in range(sampling):
        c = (lo_px + (binf + (s + 0.5) / sampling) * bin_px) / stride - 0.5
        valid = (c >= -1.0) & (c <= float(dim))
        cc = jnp.clip(c, 0.0, float(dim) - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - d))
        w = jnp.where(valid, w, 0.0)
        w_sum = w if w_sum is None else w_sum + w
    return w_sum / sampling


def _make_blocked_kernel(sizes, strides, P, RB, C, sampling, wb_sizes,
                         out_dtype, rbx, wb_offs, hpads):
    """Kernel for large feature maps (800px parity): feature levels stay
    in HBM and each (level, w-block) slice is DMA'd into VMEM only when
    the host-computed touch bitmap says an ROI of this block needs it —
    with ROIs sorted by (level, x) most (j, wb) pairs are untouched and
    their DMA + y-matmul + relayout + x-matmul are all skipped."""
    RBX = rbx
    S = RB // RBX
    srows = P * RBX

    def kernel(bits_ref, cols_ref, *refs):
        feat_refs = refs[:len(sizes)]
        out_ref = refs[len(sizes)]
        t1t_ref, acc_ref, fscr_refs, sem = (
            refs[len(sizes) + 1], refs[len(sizes) + 2],
            refs[len(sizes) + 3:-1], refs[-1])
        b = pl.program_id(0)
        j = pl.program_id(1)
        rows = P * RB
        cols = cols_ref[0]
        x0r = cols[:, 0:1]
        bwr = cols[:, 1:2]
        y0r = cols[:, 2:3]
        bhr = cols[:, 3:4]
        lvlr = cols[:, 4:5]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        binf = ((rowi // RBX) % P).astype(jnp.float32)

        acc_ref[...] = jnp.zeros((rows, P * C), jnp.float32)

        n_wb_total = wb_offs[-1] + sizes[-1][1] // wb_sizes[-1]

        for li, ((H, W), stride) in enumerate(zip(sizes, strides)):
            Wb = wb_sizes[li]
            Hp = hpads[li]
            fscr = fscr_refs[li]

            # per-(block, level) gate: ROIs are level-sorted, so most
            # blocks hold ONE level's ROIs — without this gate every
            # program paid the y-weight series eval + scaffolding for all
            # levels (the dominant fixed cost at R=1000: the adaptive
            # series is ~20 VPU ops per (row, h) element)
            lbit = bits_ref[b, j, n_wb_total + li]

            @pl.when(lbit != 0)
            def _level_body(li=li, Wb=Wb, Hp=Hp, fscr=fscr, H=H, W=W,
                            stride=stride):
                # iota over the aligned padded height; the weight mask
                # (d <= H-1) zeroes the pad rows
                h = jax.lax.broadcasted_iota(jnp.int32, (rows, Hp), 1
                                             ).astype(jnp.float32)
                wy = _axis_rows_weights(y0r, bhr, binf, h, stride, H,
                                        sampling)
                wy = jnp.where(lvlr == float(li), wy,
                               0.0).astype(jnp.bfloat16)

                # block-diag scaffolding (once per level): expansion matrix
                # E[w, w'*RBX+r'] = (w == w') and the diagonal mask
                # M[row, col] = (row % RBX == col % RBX) — wx is evaluated on
                # the COMPACT (srows, Wb) grid and expanded by one tiny MXU
                # matmul, not series-evaluated on the full block-diag grid
                E = (jax.lax.broadcasted_iota(jnp.int32, (Wb, Wb * RBX), 1)
                     // RBX == jax.lax.broadcasted_iota(
                         jnp.int32, (Wb, Wb * RBX), 0)).astype(jnp.bfloat16)
                M = (jax.lax.broadcasted_iota(
                    jnp.int32, (srows, Wb * RBX), 0) % RBX
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (srows, Wb * RBX), 1) % RBX
                ).astype(jnp.bfloat16)
                wcomp = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, Wb), 1).astype(jnp.float32)

                # dynamic w-block loop: a Python unroll here multiplies the
                # kernel's instruction count by n_wb (~40 at 800px; >20 min
                # Mosaic compiles); fori_loop keeps one body per level
                def wb_body(wbi, _, li=li, Wb=Wb, fscr=fscr, wy=wy, E=E, M=M,
                            wcomp=wcomp, H=H, W=W, stride=stride):
                    w0 = wbi * Wb
                    bit = bits_ref[b, j, wb_offs[li] + wbi]

                    @pl.when(bit != 0)
                    def _do():
                        dma = pltpu.make_async_copy(
                            feat_refs[li].at[b, :, pl.ds(w0 * C, Wb * C)],
                            fscr, sem)
                        dma.start()
                        dma.wait()
                        t1 = jax.lax.dot_general(
                            wy, fscr[...].astype(jnp.bfloat16),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
                        for sb in range(S):
                            for p in range(P):
                                tp = t1[(sb * P + p) * RBX:
                                        (sb * P + p + 1) * RBX]
                                for w in range(Wb):
                                    t1t_ref[(sb * Wb + w) * RBX:
                                            (sb * Wb + w + 1) * RBX,
                                            p * C:(p + 1) * C] = \
                                        tp[:, w * C:(w + 1) * C]
                        for sb in range(S):
                            r0 = sb * srows
                            wxc = _axis_rows_weights(
                                x0r[r0:r0 + srows], bwr[r0:r0 + srows],
                                binf[r0:r0 + srows],
                                wcomp + w0.astype(jnp.float32),
                                stride, W, sampling)
                            wxc = jnp.where(
                                lvlr[r0:r0 + srows] == float(li), wxc, 0.0)
                            wxbd = jax.lax.dot_general(
                                wxc.astype(jnp.bfloat16), E,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16) * M
                            part = jax.lax.dot_general(
                                wxbd,
                                t1t_ref[sb * Wb * RBX:(sb + 1) * Wb * RBX, :],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            acc_ref[r0:r0 + srows, :] = \
                                acc_ref[r0:r0 + srows, :] + part
                    return 0

                jax.lax.fori_loop(0, W // Wb, wb_body, 0)

        for sb in range(S):
            # cols slot 5 carries the ROI's dequantization scale (1.0 for
            # bf16 feats; the level's feat_scale for int8 pyramids)
            accv = (acc_ref[sb * srows:(sb + 1) * srows, :]
                    * cols[sb * srows:(sb + 1) * srows, 5:6]
                    ).astype(out_dtype)
            for q in range(P):
                blk = accv[q * RBX:(q + 1) * RBX]
                for p in range(P):
                    out_ref[0, sb * RBX:(sb + 1) * RBX,
                            (p * P + q) * C:(p * P + q + 1) * C] = \
                        blk[:, p * C:(p + 1) * C]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "out_size", "sampling", "canonical_size", "canonical_level",
    "min_level", "out_dtype", "interpret", "rbx", "rb"))
def roi_align_fused_blocked(feats, boxes, out_size: int, sampling: int = 0,
                            canonical_size: int = 224,
                            canonical_level: int = 4, min_level: int = 2,
                            out_dtype=jnp.bfloat16, interpret: bool = False,
                            rbx: int = 16, rb: int | None = None,
                            feat_scales=None):
    """Fused Pallas multilevel RoIAlign for LARGE feature maps.

    Same semantics as :func:`roi_align_fused` (plus exact sampling=0
    adaptive weights via the closed-form series), but feature levels stay
    in HBM: ROIs are sorted by (level, x-position), a host-side bitmap
    marks which (ROI-block, level, w-block) pairs any ROI touches, and the
    kernel DMAs + contracts only those — the XLA separable path's (R, P,
    W, C) HBM intermediates (~43 GB/batch at 800px/R=1000) never exist,
    and untouched w-blocks cost nothing. Results are scattered back to the
    caller's ROI order. Exactness vs the XLA paths is asserted in
    tests/test_model.py.

    ``feat_scales`` (n_levels,) marks ``feats`` as int8 pyramid levels
    (cfg.int8_pyramid): levels stay int8 in HBM AND in the kernel's
    DMA'd w-block slices (halving the pooler's dominant HBM traffic);
    each ROI pools from exactly one level, so its dequantization scale
    is folded into the accumulated result row, not the weights.
    """
    B, R_in = boxes.shape[:2]
    P = out_size
    C = feats[0].shape[-1]
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    strides = tuple(float(2 ** (min_level + i)) for i in range(len(feats)))

    # sort ROIs by (level, x0) so blocks are level-pure and x-local
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) \
        * jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    lvl = jnp.floor(float(canonical_level)
                    + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    lvl = jnp.clip(lvl, min_level, min_level + len(feats) - 1) - min_level
    key = lvl.astype(jnp.float32) * 1e6 + boxes[..., 0]
    order = jnp.argsort(key, axis=1)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    lvl = jnp.take_along_axis(lvl.astype(jnp.int32), order, axis=1)

    # always the largest VMEM-fitting block, padding R up: at R=1000
    # honoring divisibility (pick_rb) would pick RB=8 — 125 blocks of
    # 56-row matmuls that underfeed the MXU and re-DMA each touched
    # (level, w-block) slice per tiny block. Padded ROIs are masked out
    # of the touch bitmap, so the pad costs nothing.
    RB = rb or min(64, max(8, (448 // P) & ~7))
    R = R_in
    if R % RB:
        R = -(-R // RB) * RB
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((B, R - R_in, 4), boxes.dtype)], axis=1)
        lvl = jnp.concatenate(
            [lvl, jnp.zeros((B, R - R_in), jnp.int32)], axis=1)
    rbx = min(rbx, RB)
    nj = R // RB
    S = RB // rbx
    # largest divisor of W that is <= 16: the w-block loop tiles W
    # exactly (W=200 at 800px -> Wb=10; truncation would silently
    # drop the tail cells)
    wb_sizes = tuple(max(d for d in range(1, 17) if w % d == 0)
                     for _, w in sizes)
    n_wb = tuple(w // wb for (_, w), wb in zip(sizes, wb_sizes))
    wb_offs = tuple(int(np.sum(n_wb[:i])) for i in range(len(sizes)))

    # touch bitmap (B, nj, total w-blocks): x tap-range overlap per level
    l_of = np.concatenate([np.full(n, i) for i, n in enumerate(n_wb)]) \
        if sum(n_wb) else np.zeros(0)
    w_of = np.concatenate([np.arange(n) for n in n_wb])
    st_of = np.asarray([strides[i] for i in l_of], np.float32)
    wb_of = np.asarray([wb_sizes[i] for i in l_of], np.float32)
    Wl_of = np.asarray([sizes[i][1] for i in l_of], np.float32)
    t0x = jnp.clip(jnp.floor(boxes[..., 0:1] / st_of - 0.5), 0.0,
                   Wl_of - 1.0)
    t1x = jnp.clip(jnp.floor(boxes[..., 2:3] / st_of - 0.5) + 1.0, 0.0,
                   Wl_of - 1.0)
    touch = ((lvl[..., None] == jnp.asarray(l_of, jnp.int32))
             & (t0x // wb_of <= jnp.asarray(w_of, jnp.float32))
             & (jnp.asarray(w_of, jnp.float32) <= t1x // wb_of))
    # padded zero-boxes must not touch (zero area -> level 0, taps at
    # cell 0 -> they'd otherwise pin P2/wb0 loaded in every block)
    valid_roi = jnp.concatenate(
        [jnp.ones((B, R_in), bool), jnp.zeros((B, R - R_in), bool)],
        axis=1)
    touch = touch & valid_roi[..., None]
    bits = touch.reshape(B, nj, RB, -1).any(axis=2)
    # per-(block, level) flags appended after the w-block bits: the kernel
    # gates each level's whole body (weight series + scaffolding + w-loop)
    # on them — level-sorted blocks hold one level's ROIs, so ~3/4 of the
    # per-program fixed cost vanishes
    lbits = jnp.stack(
        [bits[..., o:o + n].any(axis=-1)
         for o, n in zip(wb_offs, n_wb)], axis=-1)
    bits = jnp.concatenate([bits, lbits], axis=-1).astype(jnp.int32)

    x0 = boxes[..., 0]
    y0 = boxes[..., 1]
    bw = (boxes[..., 2] - x0) / P
    bh = (boxes[..., 3] - y0) / P
    zero = jnp.zeros_like(x0)
    # slot 5: the ROI's dequantization scale — its level's feat_scale for
    # int8 pyramids, 1.0 for bf16 feats. Each ROI pools from exactly one
    # level, so scaling the accumulated row at the end is exact.
    if feat_scales is not None:
        scale = jnp.asarray(feat_scales, jnp.float32)[lvl]
    else:
        scale = jnp.ones_like(x0)
    cols = jnp.stack([x0, bw, y0, bh, lvl.astype(jnp.float32),
                      scale, zero, zero], axis=-1).astype(jnp.float32)
    cols = cols.reshape(B, nj, S, 1, rbx, 8)
    cols = jnp.broadcast_to(cols, (B, nj, S, P, rbx, 8))
    cols = cols.reshape(B, nj * P * RB, 8)

    feat_dtype = jnp.int8 if feat_scales is not None else jnp.bfloat16
    # int8 VMEM tiles are (32, 128): pad DMA'd slice heights accordingly
    halign = 32 if feat_scales is not None else 8
    hpads = tuple(-(-h // halign) * halign for h, _ in sizes)
    kern = _make_blocked_kernel(sizes, strides, P, RB, C, sampling,
                                wb_sizes, out_dtype, rbx, wb_offs, hpads)

    rows = P * RB
    # the touch bitmap rides scalar prefetch (SMEM, whole array) — SMEM
    # BlockSpecs reject (1, 1, n_wb) tiles
    in_specs = [
        pl.BlockSpec((1, rows, 8), lambda b, j, *_: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    for _ in sizes:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    feats = tuple(
        jnp.pad(f.reshape(f.shape[0], f.shape[1], -1).astype(feat_dtype),
                ((0, 0), (0, hp - f.shape[1]), (0, 0)))
        for f, hp in zip(feats, hpads))

    scratch = [
        pltpu.VMEM((max(wb_sizes) * RB, P * C), jnp.bfloat16),   # t1t
        pltpu.VMEM((rows, P * C), jnp.float32),                  # acc
    ]
    for hp, wb in zip(hpads, wb_sizes):
        scratch.append(pltpu.VMEM((hp, wb * C), feat_dtype))     # f blocks
    scratch.append(pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nj),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, RB, P * P * C),
                                   lambda b, j, *_: (b, j, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, P * P * C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bits, cols, *feats)
    out = out.reshape(B, R, P, P, C)[:, :R_in]
    # scatter back to the caller's ROI order
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(out, inv[..., None, None, None], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "out_size", "sampling", "canonical_size", "canonical_level",
    "min_level", "out_dtype", "interpret", "rbx", "stage", "gb",
    "relayout"))
def roi_align_fused(feats, boxes, out_size: int, sampling: int = 2,
                    canonical_size: int = 224, canonical_level: int = 4,
                    min_level: int = 2, out_dtype=jnp.bfloat16,
                    interpret: bool = False, rbx: int | None = None,
                    stage: str = "full", feat_scales=None, gb: int = 1,
                    relayout: str = "copy"):
    """Fused Pallas multilevel RoIAlign.

    out_dtype defaults to bf16: the consumers (box-head FC / mask convs,
    bf16 or int8) cast anyway, and the f32 out block measures ~6 ms/batch
    slower at the deployment shape (HBM writes double).

    feats: tuple of (B, H_l, W_l, C) NHWC tensors (P2..); boxes (B, R, 4)
    XYXY image coords. Returns (B, R, out_size, out_size, C) ``out_dtype``.
    Callers should pass only reachable levels — the max assignable level
    is bounded by the image size (e.g. P2..P4 for 256px tiles).
    """
    B, R = boxes.shape[:2]
    P = out_size
    C = feats[0].shape[-1]
    R_in = R
    if pick_rb(R, P) == 0:
        # pad the ROI axis to a blockable count (degenerate zero boxes
        # pool to zeros and are sliced off below)
        R = ((R + 31) // 32) * 32
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((B, R - R_in, 4), boxes.dtype)], axis=1)
    RB = pick_rb(R, P)
    nj = R // RB
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    strides = tuple(float(2 ** (min_level + i)) for i in range(len(feats)))
    # W blocks: cap the t1 intermediate at (P*RB, 16*C)
    # largest divisor of W that is <= 16: the w-block loop tiles W
    # exactly (W=200 at 800px -> Wb=10; truncation would silently
    # drop the tail cells)
    wb_sizes = tuple(max(d for d in range(1, 17) if w % d == 0)
                     for _, w in sizes)

    # per-ROI scalars [x0, bw, y0, bh, lvl, 0, 0, 0] expanded to the
    # kernel's (bin, roi)-ordered rows per R-block: (B, nj, P, RB, 8)
    # flattened — Mosaic cannot expand scalars across sublanes in-kernel
    x0 = boxes[..., 0]
    y0 = boxes[..., 1]
    bw = (boxes[..., 2] - x0) / P
    bh = (boxes[..., 3] - y0) / P
    area = jnp.maximum(boxes[..., 2] - x0, 0.0) \
        * jnp.maximum(boxes[..., 3] - y0, 0.0)
    lvl = jnp.floor(float(canonical_level)
                    + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    lvl = jnp.clip(lvl, min_level, min_level + len(feats) - 1) - min_level
    if rbx is None:
        rbx = 16 if RB % 16 == 0 else RB
    S = RB // rbx
    zero = jnp.zeros_like(x0)
    # slot 5: the ROI's level dequantization scale (int8 pyramid feats)
    scl = zero if feat_scales is None else \
        jnp.asarray(feat_scales, jnp.float32)[lvl.astype(jnp.int32)]
    cols = jnp.stack([x0, bw, y0, bh, lvl.astype(jnp.float32),
                      scl, zero, zero], axis=-1).astype(jnp.float32)
    # row order (sub, bin, roi') — each x-contraction sub-block is then a
    # contiguous row range (see _make_kernel's rbx note)
    cols = cols.reshape(B, nj, S, 1, rbx, 8)
    cols = jnp.broadcast_to(cols, (B, nj, S, P, rbx, 8))
    if gb > 1 and B % gb:
        gb = 1                       # grouping needs gb | B; fall back
    rows_per_img = P * RB
    if gb > 1:
        # (B, nj, rows, 8) -> (B/gb, nj, gb*rows, 8): each program's cols
        # block holds its whole image group, g-major
        cols = cols.reshape(B // gb, gb, nj, rows_per_img, 8)
        cols = jnp.swapaxes(cols, 1, 2)
        cols = cols.reshape(B // gb, nj * gb * rows_per_img, 8)
    else:
        cols = cols.reshape(B, nj * P * RB, 8)

    # touch bitmap (B, nj, total w-blocks): does any valid ROI of the
    # block sit on this level AND x-overlap this w-block? (x tap range
    # as in ops.roi_align's tap_range). Untouched pairs are pl.when-
    # skipped in-kernel — with small road boxes most of the (level,
    # w-block) grid never contributes.
    n_wb = tuple(w // wb for (_, w), wb in zip(sizes, wb_sizes))
    wb_offs = tuple(int(np.sum(n_wb[:i])) for i in range(len(sizes)))
    l_of = np.concatenate([np.full(n, i) for i, n in enumerate(n_wb)])
    w_of = np.asarray(np.concatenate([np.arange(n) for n in n_wb]),
                      np.float32)
    st_of = np.asarray([strides[i] for i in l_of], np.float32)
    wbsz_of = np.asarray([wb_sizes[i] for i in l_of], np.float32)
    Wl_of = np.asarray([sizes[i][1] for i in l_of], np.float32)
    t0x = jnp.clip(jnp.floor(boxes[..., 0:1] / st_of - 0.5), 0.0,
                   Wl_of - 1.0)
    t1x = jnp.clip(jnp.floor(boxes[..., 2:3] / st_of - 0.5) + 1.0, 0.0,
                   Wl_of - 1.0)
    touch = ((lvl[..., None] == jnp.asarray(l_of, jnp.int32))
             & (t0x // wbsz_of <= w_of)
             & (w_of <= t1x // wbsz_of))
    valid_roi = jnp.arange(R) < R_in            # pad ROIs touch nothing
    touch = touch & valid_roi[None, :, None]
    bits = touch.reshape(B, nj, RB, -1).any(axis=2).astype(jnp.int32)

    kern = _make_kernel(sizes, strides, P, RB, C, sampling, wb_sizes,
                        out_dtype, wb_offs, rbx=rbx, stage=stage,
                        scaled=feat_scales is not None, gb=gb,
                        relayout=relayout)

    rows = P * RB
    in_specs = [pl.BlockSpec((1, gb * rows, 8), lambda b, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM)]
    for H, W in sizes:
        in_specs.append(pl.BlockSpec(
            (gb, H, W * C), lambda b, j, *_: (b, 0, 0),
            memory_space=pltpu.VMEM))
    # lane-flatten (B, H, W, C) -> (B, H, W*C) outside the kernel: the
    # in-kernel w-block slice then never crosses the sublane/lane boundary
    feats = tuple(f.reshape(f.shape[0], f.shape[1], -1) for f in feats)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // gb, nj),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((gb, RB, P * P * C),
                                   lambda b, j, *_: (b, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((max(wb_sizes) * RB, P * C), jnp.bfloat16),
                pltpu.VMEM((rows, P * C), jnp.float32),      # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, P * P * C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bits, cols, *feats)
    return out.reshape(B, R, P, P, C)[:, :R_in]
