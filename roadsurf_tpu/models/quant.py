"""Quantized (int8-storage) inference path for the conv stack
(backbone / FPN / RPN head).

The detector's conv stack (ResNet50 + FPN + RPN head, ~23 GFLOP/tile of
the 33 GFLOP total) is the dominant compute AND the dominant HBM
traffic; int8 *storage* halves the bytes every conv reads/writes versus
bf16 while the MXU itself computes in bf16 (see QCONV_COMPUTE below —
measured, XLA's int8 convs run below the bf16 rate on this chip, so
int8-compute is a pessimization; int8-storage + bf16-compute is the
winning combination).

Scheme (standard post-training static quantization):
* weights: per-output-channel symmetric int8 — the FrozenBN scale is
  folded into the weight first (w' = w·γ), then sw[c] = max|w'[..., c]|/127;
* activations: per-layer symmetric int8 with a calibrated scale sa
  (the |max| over ONE calibration batch of the f32/bf16 model — callers
  should sample that batch across the deployment imagery, e.g. evenly
  strided over the AOI, so border/nodata tiles can't skew the scales);
* conv operands are stored int8 in HBM and cast to the QCONV_COMPUTE
  dtype at the conv (the convert fuses into the operand read; bf16 by
  default, int8×int8→int32 under RS_QCONV_COMPUTE=int8); the (sa·sw)
  rescale + bias + ReLU run fused in the epilogue at f32, output
  re-quantizes into the next layer's int8 domain (XLA fuses the
  elementwise chains around the convs).

Residual adds run in f32 epilogue space (simplest correct choice; the
adds are bandwidth-trivial next to the convs).

Quality guard: scripts/e2e_synthetic_quality.py runs the full chain; the
int8 path must stay within the fast-vs-exact tolerance documented there.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import max_pool, resnet_forward

_QMAX = 127.0

# Compute dtype for the quantized convs/matmuls. HBM storage is int8
# either way; this only picks the MXU mode:
#   "int8"  int8 x int8 -> int32 accumulation (the nominal 2x-rate mode)
#   "bf16"  operands cast to bf16 AT the conv (the convert fuses into the
#           operand read), f32 accumulation
# Measured on v5e (scripts/bench_conv_dtypes.py): XLA's int8 convs run
# BELOW the bf16 rate at every backbone shape (25-40 TF/s vs 42-44 at
# batch 512; 125 vs 201 at batch 64) — the int8 path wins on HBM traffic
# but loses on MXU rate, so bf16 compute over int8 storage is strictly
# faster. Numerics: int8 values and their products are exact in
# bf16/f32; only the f32 (vs int32) accumulation order differs, noise
# ~2^-24 relative — far below the quantization step itself.
QCONV_COMPUTE = os.environ.get("RS_QCONV_COMPUTE", "bf16")


# ---------------------------------------------------------------------------
# calibration: record per-layer activation maxima on the f32/bf16 model


def _unit_names_resnet(params):
    names = [("stem",)]
    for stage in ("res2", "res3", "res4", "res5"):
        for bi, bp in enumerate(params[stage]):
            for cv in ("conv1", "conv2", "conv3", "shortcut"):
                if cv in bp:
                    names.append((stage, bi, cv))
    return names


def calibrate_backbone(params, images_f32, cfg=None):
    """Returns {unit_path: activation_scale} from the |max| of each conv
    unit's INPUT on the calibration images (already preprocessed).

    Runs as ONE jitted forward returning every tracked max (eager per-op
    execution would trigger one remote compile per conv on the relayed
    TPU backend); params are a traced ARGUMENT so repeated calibrations
    (seed sweeps) reuse the compiled executable."""
    maxes = jax.device_get(_calib_backbone_fn()(params, images_f32))
    return {k: float(v) / _QMAX for k, v in maxes.items()}


from functools import lru_cache


@lru_cache(maxsize=2)
def _calib_backbone_fn():
    from .resnet import conv_bn

    def fwd(params, x):
        maxes = {}

        def track(name, t):
            maxes[name] = jnp.max(jnp.abs(t))

        track(("stem",), x)
        h = conv_bn(x, params["stem"], stride=2, dtype=jnp.float32)
        h = max_pool(h, 3, 2)
        for si, stage in enumerate(("res2", "res3", "res4", "res5")):
            first_stride = 1 if si == 0 else 2
            for bi, bp in enumerate(params[stage]):
                stride = first_stride if bi == 0 else 1
                track((stage, bi, "conv1"), h)
                out = conv_bn(h, bp["conv1"], stride=stride,
                              dtype=jnp.float32)
                track((stage, bi, "conv2"), out)
                out = conv_bn(out, bp["conv2"], stride=1,
                              dtype=jnp.float32)
                track((stage, bi, "conv3"), out)
                out = conv_bn(out, bp["conv3"], stride=1, relu=False,
                              dtype=jnp.float32)
                if "shortcut" in bp:
                    track((stage, bi, "shortcut"), h)
                    sc = conv_bn(h, bp["shortcut"], stride=stride,
                                 relu=False, dtype=jnp.float32)
                else:
                    sc = h
                h = jnp.maximum(out + sc, 0.0)
        return maxes

    return jax.jit(fwd)


# ---------------------------------------------------------------------------
# quantized parameters


def quantize_unit(p, act_scale: float):
    """Fold FrozenBN, per-output-channel int8 weights, fused rescale."""
    w = np.asarray(p["w"], np.float32) * np.asarray(p["scale"], np.float32)
    sw = np.max(np.abs(w), axis=(0, 1, 2)) / _QMAX          # (Cout,)
    sw = np.maximum(sw, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return {
        "wq": jnp.asarray(wq),
        # epilogue multiplier: int32 accum × (sa·sw) per out channel
        "mult": jnp.asarray(act_scale * sw, np.float32),
        "bias": jnp.asarray(np.asarray(p["bias"], np.float32)),
        "sa": jnp.asarray(np.float32(act_scale)),
    }


def quantize_stem_u8(stem_p, pixel_mean, pixel_std, image_size: int):
    """uint8-direct stem: consume raw tiles as EXACT int8, no preprocess.

    ``q = img - 128`` is exactly representable in int8, so the float
    normalize pass ((img-mean)/std) and the input quantization both
    disappear: fold 1/std into the weights per INPUT channel, and fold
    the constant offset ``offs = 128-mean`` into a positional bias map —
    conv_pad0(x, w) == conv_pad0(q, w/std) + conv_pad0(offs·1_in, w/std)
    where the second term is constant in the interior and varies only
    where the 7x7 window hangs over the zero-padded border (x is padded
    with zeros, q with exact -128-equivalent zeros — the bias map, built
    by convolving the offs-constant image once at quantization time,
    accounts for both). Input scale is exactly 1, so unlike the
    calibrated-stem path this adds NO input rounding error; it removes
    the ~6 ms/batch-512 u8→f32→i8 HBM round-trip (read 100 MB u8, write
    400 MB f32, read f32, write 100 MB i8 → read u8, write i8)."""
    w = np.asarray(stem_p["w"], np.float32) \
        * np.asarray(stem_p["scale"], np.float32)
    std = np.asarray(pixel_std, np.float32)
    w = w / std[None, None, :, None]
    sw = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / _QMAX, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    # the folded weights already carry the 1/std, so the constant image
    # convolved for the bias map is (128-mean), NOT (128-mean)/std
    offs = 128.0 - np.asarray(pixel_mean, np.float32)
    ones = jnp.asarray(np.broadcast_to(
        offs, (1, image_size, image_size, 3)).astype(np.float32))
    # use the DEQUANTIZED weights so the constant term matches the int8
    # conv's own weight rounding exactly
    wdq = jnp.asarray(wq.astype(np.float32) * sw)
    k = wq.shape[0]
    bmap = jax.lax.conv_general_dilated(
        ones, wdq, window_strides=(2, 2), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    bias = jnp.asarray(np.asarray(stem_p["bias"], np.float32)) + bmap
    return {"wq": jnp.asarray(wq), "mult": jnp.asarray(sw, np.float32),
            "bias": bias, "sa": jnp.asarray(np.float32(1.0))}


def quantize_backbone(params, act_scales: dict):
    q: dict = {"stem": quantize_unit(params["stem"], act_scales[("stem",)])}
    for stage in ("res2", "res3", "res4", "res5"):
        blocks = []
        for bi, bp in enumerate(params[stage]):
            blk = {}
            for cv in ("conv1", "conv2", "conv3", "shortcut"):
                if cv in bp:
                    # the shortcut consumes the SAME tensor as conv1;
                    # pinning it to conv1's scale lets the streaming
                    # forward quantize the block input once for both
                    key = (stage, bi, "conv1") if cv == "shortcut" \
                        else (stage, bi, cv)
                    blk[cv] = quantize_unit(bp[cv], act_scales[key])
            blocks.append(blk)
        q[stage] = blocks
    return q


# ---------------------------------------------------------------------------
# int8 forward


def _qconv(xq, wq, stride):
    if QCONV_COMPUTE == "bf16":
        xq, wq = xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16)
        acc = jnp.float32
    else:
        acc = jnp.int32
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride),
        padding=[(wq.shape[0] // 2, wq.shape[0] // 2)] * 2
        if wq.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def _quantize_act(x, sa):
    q = jnp.round(x / sa)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def qconv_int8_in(xq, qp, stride=1, relu=True, sa_out=None, mult=None):
    """Conv on an int8 input already in qp's activation domain.

    ``sa_out=None`` returns the bf16 epilogue output; otherwise the
    epilogue quantizes straight into the consumer's int8 domain
    (**streaming**) — between two quantized convs this skips the bf16
    write+read entirely, halving the inter-layer HBM traffic that
    dominates the backbone's cost (the conv stack is bandwidth-bound at
    256px: ~27% MXU utilization measured before streaming).

    ``mult`` overrides the epilogue multiplier (int8-pyramid mode: the
    input arrives in a per-level scale, so mult = s_level · sw)."""
    y = _qconv(xq, qp["wq"], stride).astype(jnp.float32)
    y = y * (qp["mult"] if mult is None else mult) + qp["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if sa_out is None:
        return y.astype(jnp.bfloat16)
    q = jnp.round(y * (1.0 / sa_out))
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def qconv_unit(x, qp, stride=1, relu=True):
    """x: f32/bf16 activations; returns bf16 epilogue output (the
    rescale chain runs f32 fused into the conv)."""
    xq = _quantize_act(x.astype(jnp.float32), qp["sa"])
    return qconv_int8_in(xq, qp, stride=stride, relu=relu)


def max_pool_i8(x, window=3, stride=2):
    """int8 max pool (resnet.max_pool geometry). Quantization is monotone
    non-decreasing, so pooling the quantized stream equals quantizing the
    pooled bf16 stream; the -128 pad never wins against relu'd values."""
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])


def prepare_int8_params(params, images_u8, cfg, image_size: int | None = None):
    """Calibrate on a sample uint8 tile batch and return the quantized
    backbone params to merge into the inference params dict under
    ``backbone_q`` (consumed when cfg.int8_backbone is set)."""
    from .mask_rcnn import preprocess

    S = image_size or cfg.min_size_test or images_u8.shape[1]
    x = preprocess(jnp.asarray(images_u8), cfg, S)
    scales = calibrate_backbone(params["backbone"], x, cfg)
    host_bb = jax.device_get(params["backbone"])
    q = quantize_backbone(host_bb, scales)
    q["stem_u8"] = quantize_stem_u8(host_bb["stem"], cfg.pixel_mean,
                                    cfg.pixel_std, S)
    return q


def resnet_forward_int8(qparams, images, out_sas=None):
    """images: preprocessed f32 (B, H, W, 3) — or RAW uint8 tiles when
    ``qparams['stem_u8']`` exists and matches the input size (the
    uint8-direct stem: :func:`quantize_stem_u8`); returns res2..res5 bf16 —
    or int8 in the given per-stage scales when ``out_sas`` is set
    (int8-pyramid mode: the FPN laterals' calibrated input scales, so the
    stage outputs stream straight into the quantized lateral convs and the
    bf16 materialization disappears).

    Fully-streamed form: the RESIDUAL stream stays int8 too. The block
    input is quantized once into its conv1 scale (the projection shortcut
    shares that tensor and — enforced by :func:`quantize_backbone` — its
    scale); conv1→conv2→conv3 links carry int8 in the consumer's domain;
    the conv3 epilogue fuses rescale + shortcut add (dequantized from the
    block-input int8 for identity blocks) + relu + REQUANTIZE into the
    next block's conv1 domain, so within a stage no bf16 activation ever
    touches HBM — at 256px the backbone is bandwidth-bound and the bf16
    residual round-trips were ~40% of its traffic. Only each stage's
    final output materializes bf16 (the FPN laterals' interface). The
    stem streams straight into res2[0]'s conv1 domain through an int8
    max pool."""
    first = qparams["res2"][0]
    # (a bit-exact space-to-depth 4x4 form of this 7x7 stride-2 stem was
    # tried — 2x2-blocked input, Cin 3->12, 4x fewer positions — and
    # measured ~3% SLOWER whole-model: the extra int8 relayout pass costs
    # more than the deeper contraction saves)
    if images.dtype == jnp.uint8 and "stem_u8" in qparams:
        # uint8-direct: img - 128 is the two's-complement bit pattern
        # img ^ 0x80 — one elementwise op, exact int8, no preprocess
        qin = jax.lax.bitcast_convert_type(images ^ jnp.uint8(0x80),
                                           jnp.int8)
        x8 = qconv_int8_in(qin, qparams["stem_u8"], stride=2, relu=True,
                           sa_out=first["conv1"]["sa"])
    else:
        stem = qparams["stem"]
        xq = _quantize_act(images.astype(jnp.float32), stem["sa"])
        x8 = qconv_int8_in(xq, stem, stride=2, relu=True,
                           sa_out=first["conv1"]["sa"])
    x8 = max_pool_i8(x8, 3, 2)
    feats = {}
    stages = ("res2", "res3", "res4", "res5")
    for si, stage in enumerate(stages):
        first_stride = 1 if si == 0 else 2
        blocks = qparams[stage]
        for bi, bp in enumerate(blocks):
            stride = first_stride if bi == 0 else 1
            t = qconv_int8_in(x8, bp["conv1"], stride=stride, relu=True,
                              sa_out=bp["conv2"]["sa"])
            t = qconv_int8_in(t, bp["conv2"], relu=True,
                              sa_out=bp["conv3"]["sa"])
            out = qconv_int8_in(t, bp["conv3"], relu=False)
            if "shortcut" in bp:
                sc = qconv_int8_in(x8, bp["shortcut"], stride=stride,
                                   relu=False).astype(jnp.float32)
            else:
                sc = x8.astype(jnp.float32) * bp["conv1"]["sa"]
            h = jnp.maximum(out.astype(jnp.float32) + sc, 0.0)
            if bi + 1 < len(blocks):
                x8 = _quantize_act(h, blocks[bi + 1]["conv1"]["sa"])
            elif si + 1 < len(stages):
                x8 = _quantize_act(h, qparams[stages[si + 1]][0]
                                   ["conv1"]["sa"])
        feats[stage] = h.astype(jnp.bfloat16) if out_sas is None \
            else _quantize_act(h, out_sas[si])
    return feats


# ---------------------------------------------------------------------------
# wider scope: FPN / RPN head / box FCs / mask convs (cfg.int8_scope)


def quantize_plain(p, act_scale: float):
    """Per-output-channel int8 for a plain conv/linear unit {'w', 'b'}
    (weight layout (..., Cout))."""
    w = np.asarray(p["w"], np.float32)
    sw = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0) / _QMAX
    sw = np.maximum(sw, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    return {
        "wq": jnp.asarray(wq),
        "mult": jnp.asarray(act_scale * sw, np.float32),
        "bias": jnp.asarray(np.asarray(p["b"], np.float32)),
        "sa": jnp.asarray(np.float32(act_scale)),
    }


def quantize_deconv(p, act_scale: float):
    """Per-output-channel int8 for the mask head's 2x2/2 ConvTranspose unit
    {'w' (kh, kw, out, in), 'b'} — output channels on axis 2 (the
    transpose_kernel=True torch layout, roi_heads.mask_head_forward)."""
    w = np.asarray(p["w"], np.float32)
    sw = np.max(np.abs(np.moveaxis(w, 2, -1).reshape(-1, w.shape[2])),
                axis=0) / _QMAX
    sw = np.maximum(sw, 1e-12)
    wq = np.clip(np.round(w / sw[None, None, :, None]), -127, 127) \
        .astype(np.int8)
    return {
        "wq": jnp.asarray(wq),
        "mult": jnp.asarray(act_scale * sw, np.float32),
        "bias": jnp.asarray(np.asarray(p["b"], np.float32)),
        "sa": jnp.asarray(np.float32(act_scale)),
    }


def qdeconv_int8_in(xq, qp, relu=True, sa_out=None):
    """2x stride-2 ConvTranspose on an int8 input in qp's domain;
    operands cast to QCONV_COMPUTE at the op (bf16/f32-acc by default,
    int8/int32-acc override), f32 epilogue (same contract as
    qconv_int8_in)."""
    if QCONV_COMPUTE == "bf16":
        xq, wq, acc = (xq.astype(jnp.bfloat16),
                       qp["wq"].astype(jnp.bfloat16), jnp.float32)
    else:
        wq, acc = qp["wq"], jnp.int32
    y = jax.lax.conv_transpose(
        xq, wq, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        preferred_element_type=acc).astype(jnp.float32)
    y = y * qp["mult"] + qp["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    if sa_out is None:
        return y.astype(jnp.bfloat16)
    q = jnp.round(y * (1.0 / sa_out))
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def qlinear(x, qp, relu=False):
    """Matmul on int8-quantized operands in the QCONV_COMPUTE dtype
    (bf16/f32-acc default, int8/int32-acc override); f32 epilogue,
    bf16 out."""
    xq = _quantize_act(x.astype(jnp.float32), qp["sa"])
    if QCONV_COMPUTE == "bf16":
        y = jnp.dot(xq.astype(jnp.bfloat16), qp["wq"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(xq, qp["wq"], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * qp["mult"] + qp["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def fpn_forward_int8(qp, feats, dtype=jnp.bfloat16):
    """Quantized FPN (models/fpn.py structure: laterals, top-down sum,
    output convs, P6 maxpool)."""
    from .fpn import upsample2x_nearest

    names = ["res2", "res3", "res4", "res5"]
    laterals = [qconv_unit(feats[n], qp[f"lateral{i + 2}"], relu=False)
                for i, n in enumerate(names)]
    tds = [None] * 4
    tds[3] = laterals[3]
    for i in (2, 1, 0):
        tds[i] = (laterals[i] + upsample2x_nearest(tds[i + 1])).astype(dtype)
    outs = [qconv_unit(tds[i], qp[f"output{i + 2}"], relu=False)
            for i in range(4)]
    p6 = jax.lax.reduce_window(
        outs[3], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "VALID")
    outs.append(p6)
    return outs


def rpn_head_forward_int8(qp, feats, num_anchors: int = 3,
                          dtype=jnp.bfloat16):
    """Quantized StandardRPNHead (models/rpn.py structure); the shared
    conv uses ONE activation scale across pyramid levels (the max), and
    streams its epilogue straight into the two predictor convs' shared
    int8 domain (:func:`prepare_quantized` pins objectness/deltas to one
    scale — they consume the same tensor)."""
    logits, deltas = [], []
    for f in feats:
        fq = _quantize_act(f.astype(jnp.float32), qp["conv"]["sa"])
        t = qconv_int8_in(fq, qp["conv"], relu=True,
                          sa_out=qp["objectness"]["sa"])
        o = qconv_int8_in(t, qp["objectness"], relu=False)
        d = qconv_int8_in(t, qp["deltas"], relu=False)
        b, h, w, _ = o.shape
        logits.append(o.reshape(b, h * w * num_anchors))
        deltas.append(d.reshape(b, h * w * num_anchors, 4))
    return logits, deltas


def fpn_forward_int8_pyr(qp, pyr, feats_i8, dtype=jnp.bfloat16):
    """int8-pyramid FPN: consumes int8 ResNet stage outputs (already in
    the lateral convs' activation scales — resnet_forward_int8 with
    ``out_sas``) and emits [P2..P6] as int8 in the calibrated per-level
    output scales ``pyr['out_sa']``. With ``pyr['lat_sa']`` present the
    TOP-DOWN pathway itself is int8 too: laterals emit int8 in their own
    calibrated scales, the nearest upsample replicates int8 exactly, and
    each top-down add runs f32 fused (dequant + add + requant into the
    output conv's input scale) — at 256px the bf16 P2-sized top-down
    round-trips were the FPN's dominant remaining HBM traffic. P6 is an
    exact int8 subsample of P5 (1x1 window, stride 2 — scale shared)."""
    from .fpn import upsample2x_nearest

    out_sa = pyr["out_sa"]
    names = ["res2", "res3", "res4", "res5"]
    lat_sa = pyr.get("lat_sa")
    if lat_sa is None:                      # legacy tree: bf16 top-down
        laterals = [qconv_int8_in(feats_i8[n], qp[f"lateral{i + 2}"],
                                  relu=False)
                    for i, n in enumerate(names)]
        tds = [None] * 4
        tds[3] = laterals[3]
        for i in (2, 1, 0):
            tds[i] = (laterals[i]
                      + upsample2x_nearest(tds[i + 1])).astype(dtype)
        outs = [qconv_unit_out(tds[i], qp[f"output{i + 2}"], out_sa[i])
                for i in range(4)]
    else:
        td_sa = [qp[f"output{i + 2}"]["sa"] for i in range(4)]
        laterals = [qconv_int8_in(feats_i8[n], qp[f"lateral{i + 2}"],
                                  relu=False, sa_out=lat_sa[i])
                    for i, n in enumerate(names)]
        tds = [None] * 4
        # top level: rescale lat scale -> output conv's input scale
        tds[3] = _quantize_act(
            laterals[3].astype(jnp.float32) * lat_sa[3], td_sa[3])
        for i in (2, 1, 0):
            up = upsample2x_nearest(tds[i + 1])
            s = laterals[i].astype(jnp.float32) * lat_sa[i] \
                + up.astype(jnp.float32) * td_sa[i + 1]
            tds[i] = _quantize_act(s, td_sa[i])
        outs = [qconv_int8_in(tds[i], qp[f"output{i + 2}"],
                              relu=False, sa_out=out_sa[i])
                for i in range(4)]
    p6 = jax.lax.reduce_window(
        outs[3], jnp.int8(-128), jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
        "VALID")
    outs.append(p6)
    return outs


def qconv_unit_out(x, qp, sa_out, stride=1, relu=False):
    """bf16/f32 in → int8 out in ``sa_out`` (streaming epilogue)."""
    xq = _quantize_act(x.astype(jnp.float32), qp["sa"])
    return qconv_int8_in(xq, qp, stride=stride, relu=relu, sa_out=sa_out)


def rpn_head_forward_int8_pyr(qp, pyr, feats_i8, num_anchors: int = 3,
                              dtype=jnp.bfloat16):
    """StandardRPNHead over int8 pyramid levels: the shared conv consumes
    each level DIRECTLY in its pyramid scale (per-level epilogue mult
    ``pyr['rpn_mult']`` = s_level · sw — no requantize pass over P2), then
    streams into the predictors' shared int8 domain as in
    :func:`rpn_head_forward_int8`."""
    logits, deltas = [], []
    for li, f in enumerate(feats_i8):
        t = qconv_int8_in(f, qp["conv"], relu=True,
                          sa_out=qp["objectness"]["sa"],
                          mult=pyr["rpn_mult"][li])
        o = qconv_int8_in(t, qp["objectness"], relu=False)
        d = qconv_int8_in(t, qp["deltas"], relu=False)
        b, h, w, _ = o.shape
        logits.append(o.reshape(b, h * w * num_anchors))
        deltas.append(d.reshape(b, h * w * num_anchors, 4))
    return logits, deltas


def calibrate_inference(params, x, cfg, image_size: int):
    """Activation maxima for every extended-scope unit, recorded from ONE
    jitted forward of the real pipeline (backbone → FPN → RPN → proposal
    selection → box pooling/FCs → mask pooling/convs).

    Mask-conv inputs are taken from the pooled features of the top
    detections_per_image *proposals* rather than post-NMS detections: the
    activation RANGE is what calibration needs, and proposal ROI features
    draw from the same FPN value distribution. Params are a traced
    argument — repeated calibrations reuse one compile per (cfg, size)."""
    maxes = jax.device_get(_calib_inference_fn(cfg, image_size)(params, x))
    return {k: float(v) / _QMAX for k, v in maxes.items()}


@lru_cache(maxsize=8)
def _calib_inference_fn(cfg, image_size: int):
    from .anchors import all_level_anchors
    from .fpn import fpn_forward, upsample2x_nearest
    from .roi_heads import _linear
    from .rpn import rpn_head_forward, select_proposals
    from ..ops.roi_align import roi_align_multilevel

    S = image_size
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)

    def fwd(params, x):
        m = {}

        def track(name, t):
            prev = m.get(name)
            v = jnp.max(jnp.abs(t))
            m[name] = v if prev is None else jnp.maximum(prev, v)

        feats = resnet_forward(params["backbone"], x, jnp.float32)
        # FPN taps (same structure as fpn_forward)
        names = ["res2", "res3", "res4", "res5"]
        for i, n in enumerate(names):
            track(("fpn", f"lateral{i + 2}"), feats[n])
        fp = params["fpn"]
        laterals = [_conv_b32(feats[n], fp[f"lateral{i + 2}"])
                    for i, n in enumerate(names)]
        tds = [None] * 4
        tds[3] = laterals[3]
        for i in (2, 1, 0):
            tds[i] = laterals[i] + upsample2x_nearest(tds[i + 1])
        for i in range(4):
            track(("fpn", f"output{i + 2}"), tds[i])
        # lateral-output scales (int8 top-down pathway)
        for i in range(4):
            track(("fpn", f"lat_out{i + 2}"), laterals[i])
        fpn_feats = fpn_forward(params["fpn"], feats, jnp.float32)
        # pyramid-output scales (int8_pyramid): the P-levels themselves
        for i, f in enumerate(fpn_feats[:4]):
            track(("fpn_out", i + 2), f)

        # RPN taps: shared conv => shared (max-over-levels) scales
        rp = params["rpn"]
        for f in fpn_feats:
            track(("rpn", "conv"), f)
            t = jax.lax.conv_general_dilated(
                f, rp["conv"]["w"].astype(jnp.float32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            t = jnp.maximum(t + rp["conv"]["b"], 0.0)
            track(("rpn", "objectness"), t)
            track(("rpn", "deltas"), t)

        logits, dl = rpn_head_forward(rp, fpn_feats, cfg.num_anchors,
                                      jnp.float32)
        proposals, _ = select_proposals(
            logits, dl, anchors, S, cfg.rpn_pre_nms_topk_test,
            cfg.rpn_post_nms_topk_test, cfg.rpn_nms_thresh,
            fast_nms=getattr(cfg, "fast_nms", False))

        # box head taps
        bp = params["box_head"]
        pooled = roi_align_multilevel(
            fpn_feats[:4], proposals, cfg.box_pooler_resolution,
            sampling=cfg.pooler_sampling_ratio,
            canonical_size=cfg.canonical_box_size,
            canonical_level=cfg.canonical_level)
        xf = pooled.reshape(pooled.shape[0] * pooled.shape[1], -1)
        track(("box", "fc1"), xf)
        x1 = jnp.maximum(_linear(xf, bp["fc1"], jnp.float32), 0.0)
        track(("box", "fc2"), x1)

        # mask head taps (top-D proposal features)
        mp = params["mask_head"]
        mpool = roi_align_multilevel(
            fpn_feats[:4], proposals[:, :cfg.detections_per_image],
            cfg.mask_pooler_resolution,
            sampling=cfg.pooler_sampling_ratio,
            canonical_size=cfg.canonical_box_size,
            canonical_level=cfg.canonical_level)
        h = mpool.reshape(-1, cfg.mask_pooler_resolution,
                          cfg.mask_pooler_resolution, mpool.shape[-1])
        for i in range(cfg.mask_num_conv):
            track(("mask", f"conv{i + 1}"), h)
            p = mp[f"conv{i + 1}"]
            h = jax.lax.conv_general_dilated(
                h.astype(jnp.float32), p["w"].astype(jnp.float32), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.maximum(h + p["b"], 0.0)
        # mask tail taps: deconv input (= conv4 relu) and predictor input
        # (= deconv relu) for the int8 mask-tail stream
        track(("mask", "deconv"), h)
        dp = mp["deconv"]
        hd = jax.lax.conv_transpose(
            h, dp["w"].astype(jnp.float32), strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True) + dp["b"]
        hd = jnp.maximum(hd, 0.0)
        track(("mask", "predictor"), hd)
        return m

    return jax.jit(fwd)


def _conv_b32(x, p):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["w"].astype(jnp.float32), (1, 1),
        "SAME" if p["w"].shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def prepare_quantized(params, images_u8, cfg, image_size: int | None = None):
    """Calibrate + quantize per ``cfg.int8_scope`` (or the legacy
    ``int8_backbone``). Returns the tree for ``params['quant']``:
    {'backbone': ..., 'fpn': ..., 'rpn': ..., 'box': ..., 'mask': ...}
    with only the in-scope groups present."""
    from .mask_rcnn import preprocess

    scope = getattr(cfg, "int8_scope", "") \
        or ("backbone" if getattr(cfg, "int8_backbone", False) else "")
    if not scope:
        return {}
    S = image_size or cfg.min_size_test or images_u8.shape[1]
    x = preprocess(jnp.asarray(images_u8), cfg, S)
    host = jax.device_get(params)

    q = {"backbone": quantize_backbone(
        host["backbone"], calibrate_backbone(params["backbone"], x, cfg))}
    # uint8-direct stem: only valid when inference consumes native-size
    # tiles (no device resize) — forward_inference checks the size match
    q["backbone"]["stem_u8"] = quantize_stem_u8(
        host["backbone"]["stem"], cfg.pixel_mean, cfg.pixel_std, S)
    if scope == "backbone":
        return q

    scales = calibrate_inference(params, x, cfg, S)
    q["fpn"] = {k: quantize_plain(host["fpn"][k], scales[("fpn", k)])
                for k in host["fpn"]}
    # objectness/deltas consume the same post-relu tensor: one shared
    # scale lets the RPN conv stream int8 into both predictors
    s_t = max(scales[("rpn", "objectness")], scales[("rpn", "deltas")])
    q["rpn"] = {"conv": quantize_plain(host["rpn"]["conv"],
                                       scales[("rpn", "conv")]),
                "objectness": quantize_plain(host["rpn"]["objectness"], s_t),
                "deltas": quantize_plain(host["rpn"]["deltas"], s_t)}
    if getattr(cfg, "int8_pyramid", False):
        # int8-pyramid interface: per-level P-output scales (P6 is an
        # exact subsample of P5 — shared scale), the ResNet stage-output
        # scales (the laterals' input scales, so the backbone streams
        # int8 straight into the quantized laterals), and the RPN shared
        # conv's per-level epilogue multipliers s_level*sw (it consumes
        # the pyramid levels directly, no requantize pass)
        out_list = [scales[("fpn_out", i + 2)] for i in range(4)]
        out_list.append(out_list[3])
        sw = np.asarray(q["rpn"]["conv"]["mult"], np.float32) \
            / np.float32(scales[("rpn", "conv")])
        q["pyr"] = {
            "out_sa": jnp.asarray(out_list, jnp.float32),
            "res_sa": jnp.asarray(
                [scales[("fpn", f"lateral{i + 2}")] for i in range(4)],
                jnp.float32),
            "rpn_mult": jnp.stack(
                [jnp.asarray(s * sw, jnp.float32) for s in out_list]),
            # int8 top-down pathway: per-level lateral-output scales; the
            # top-down sums themselves ride in the output convs' input
            # scales (q['fpn'][f'output{i}']['sa'])
            "lat_sa": jnp.asarray(
                [scales[("fpn", f"lat_out{i + 2}")] for i in range(4)],
                jnp.float32),
        }
    if scope == "convnet":
        return q

    q["box"] = {k: quantize_plain(host["box_head"][k], scales[("box", k)])
                for k in ("fc1", "fc2")}
    q["mask"] = {f"conv{i + 1}": quantize_plain(
        host["mask_head"][f"conv{i + 1}"], scales[("mask", f"conv{i + 1}")])
        for i in range(cfg.mask_num_conv)}
    # int8 mask tail: the deconv streams int8 from conv4's epilogue and the
    # predictor consumes the relu'd deconv as int8 — the (R, 28, 28, 256)
    # interface (the mask head's largest tensor) then never touches HBM in
    # bf16. Predictor WEIGHTS stay per-channel int8 like every other unit;
    # its output math is f32 (mask logits).
    q["mask"]["deconv"] = quantize_deconv(
        host["mask_head"]["deconv"], scales[("mask", "deconv")])
    q["mask"]["predictor"] = quantize_plain(
        host["mask_head"]["predictor"], scales[("mask", "predictor")])
    return q
