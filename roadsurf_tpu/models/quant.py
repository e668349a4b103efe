"""Int8 inference path for the conv stack (backbone / FPN / RPN head).

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate; the detector's conv
stack (ResNet50 + FPN + RPN head, ~23 GFLOP/tile of the 33 GFLOP total)
is MXU-bound, so static int8 quantization is the single largest remaining
throughput lever after the pooler fusion.

Scheme (standard post-training static quantization):
* weights: per-output-channel symmetric int8 — the FrozenBN scale is
  folded into the weight first (w' = w·γ), then sw[c] = max|w'[..., c]|/127;
* activations: per-layer symmetric int8 with a calibrated scale sa
  (the |max| over ONE calibration batch of the f32/bf16 model — callers
  should sample that batch across the deployment imagery, e.g. evenly
  strided over the AOI, so border/nodata tiles can't skew the scales);
* conv executes as int8 with int32 accumulation
  (``preferred_element_type=int32``); the (sa·sw) rescale + bias + ReLU
  run fused in the epilogue at f32, output re-quantizes into the next
  layer's int8 domain (XLA fuses the elementwise chains around the convs).

Residual adds run in f32 epilogue space (simplest correct choice; the
adds are bandwidth-trivial next to the convs).

Quality guard: scripts/e2e_synthetic_quality.py runs the full chain; the
int8 path must stay within the fast-vs-exact tolerance documented there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import max_pool

_QMAX = 127.0


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
    TPU backend)."""
    from .resnet import conv_bn

    def fwd(x):
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

    maxes = jax.device_get(jax.jit(fwd)(images_f32))
    return {k: float(v) / _QMAX for k, v in maxes.items()}


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


def quantize_backbone(params, act_scales: dict):
    q: dict = {"stem": quantize_unit(params["stem"], act_scales[("stem",)])}
    for stage in ("res2", "res3", "res4", "res5"):
        blocks = []
        for bi, bp in enumerate(params[stage]):
            blk = {}
            for cv in ("conv1", "conv2", "conv3", "shortcut"):
                if cv in bp:
                    blk[cv] = quantize_unit(bp[cv],
                                            act_scales[(stage, bi, cv)])
            blocks.append(blk)
        q[stage] = blocks
    return q


# ---------------------------------------------------------------------------
# int8 forward


def _qconv(xq, wq, stride):
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride),
        padding=[(wq.shape[0] // 2, wq.shape[0] // 2)] * 2
        if wq.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _quantize_act(x, sa):
    q = jnp.round(x / sa)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def qconv_unit(x, qp, stride=1, relu=True):
    """x: f32/bf16 activations; returns bf16 epilogue output (the
    inter-layer stream stays bf16 so activation bandwidth matches the
    bf16 path; the rescale chain runs f32 fused into the conv)."""
    xq = _quantize_act(x.astype(jnp.float32), qp["sa"])
    y = _qconv(xq, qp["wq"], stride).astype(jnp.float32)
    y = y * qp["mult"] + qp["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def prepare_int8_params(params, images_u8, cfg, image_size: int | None = None):
    """Calibrate on a sample uint8 tile batch and return the quantized
    backbone params to merge into the inference params dict under
    ``backbone_q`` (consumed when cfg.int8_backbone is set)."""
    from .mask_rcnn import preprocess

    S = image_size or cfg.min_size_test or images_u8.shape[1]
    x = preprocess(jnp.asarray(images_u8), cfg, S)
    scales = calibrate_backbone(params["backbone"], x, cfg)
    return quantize_backbone(jax.device_get(params["backbone"]), scales)


def resnet_forward_int8(qparams, images):
    """images: preprocessed f32 (B, H, W, 3); returns res2..res5 bf16."""
    x = qconv_unit(images, qparams["stem"], stride=2)
    x = max_pool(x, 3, 2)
    feats = {}
    for si, stage in enumerate(("res2", "res3", "res4", "res5")):
        first_stride = 1 if si == 0 else 2
        for bi, bp in enumerate(qparams[stage]):
            stride = first_stride if bi == 0 else 1
            out = qconv_unit(x, bp["conv1"], stride=stride)
            out = qconv_unit(out, bp["conv2"], stride=1)
            out = qconv_unit(out, bp["conv3"], stride=1, relu=False)
            sc = qconv_unit(x, bp["shortcut"], stride=stride, relu=False) \
                if "shortcut" in bp else x
            x = jnp.maximum(out + sc, 0.0)
        feats[stage] = x.astype(jnp.bfloat16)
    return feats
