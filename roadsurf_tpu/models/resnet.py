"""ResNet-50 backbone with frozen BatchNorm, functional JAX, NHWC.

TPU-first re-design of the backbone pinned by the reference's detectron2
config (detectron2_config_3bands.yaml:92-111 — DEPTH 50, NORM FrozenBN,
STRIDE_IN_1X1 true, RES2_OUT 256, STEM_OUT 64):

* layout NHWC / HWIO so XLA tiles convs straight onto the MXU;
* FrozenBN is two per-channel constants (scale, bias) applied in the conv
  epilogue — XLA fuses them, no batch statistics anywhere;
* parameters are plain nested dicts (pytrees), so sharding annotations and
  detectron2-checkpoint conversion are direct.

Params schema (per conv+frozenBN unit): {"w": HWIO, "scale": C, "bias": C}.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

BLOCKS_PER_STAGE = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def conv(x, w, stride=1, dtype=jnp.bfloat16):
    # Output dtype matches compute dtype (MXU still accumulates f32
    # internally); keeping in/out dtypes equal keeps the conv transpose rule
    # consistent under jax.grad for mixed-precision training.
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride),
        padding=[(w.shape[0] // 2, w.shape[0] // 2)] * 2
        if w.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_bn(x, p, stride=1, relu=True, dtype=jnp.bfloat16):
    # FrozenBN folds into the (tiny) weight tensor instead of a per-pixel
    # f32 affine: w' = w·scale per out-channel, so the activation path stays
    # in the compute dtype end to end (the f32 elementwise round trips after
    # every conv were the backbone's bandwidth bottleneck).
    w = p["w"] * p["scale"]
    y = conv(x, w, stride, dtype) + p["bias"].astype(dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def bottleneck(x, p, stride=1, dtype=jnp.bfloat16):
    """Bottleneck block, stride in the 1x1 conv (detectron2 convention,
    detectron2_config_3bands.yaml:111)."""
    out = conv_bn(x, p["conv1"], stride=stride, dtype=dtype)
    out = conv_bn(out, p["conv2"], stride=1, dtype=dtype)
    out = conv_bn(out, p["conv3"], stride=1, relu=False, dtype=dtype)
    if "shortcut" in p:
        sc = conv_bn(x, p["shortcut"], stride=stride, relu=False, dtype=dtype)
    else:
        sc = x
    return jnp.maximum(out + sc, 0.0).astype(dtype)


def max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])


def resnet_forward(params: dict, images: jnp.ndarray,
                   dtype=jnp.bfloat16) -> dict:
    """images: (B, H, W, 3) float; returns {'res2'..'res5'} NHWC features."""
    x = conv_bn(images, params["stem"], stride=2, dtype=dtype)
    x = max_pool(x, 3, 2)
    feats = {}
    for si, stage in enumerate(["res2", "res3", "res4", "res5"]):
        first_stride = 1 if si == 0 else 2
        for bi, bp in enumerate(params[stage]):
            x = bottleneck(x, bp, stride=first_stride if bi == 0 else 1,
                           dtype=dtype)
        feats[stage] = x
    return feats


# ---------------------------------------------------------------------------
# initialization

def _conv_init(key, kh, kw, cin, cout):
    # He/MSRA fan-out, matching detectron2's default conv init
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _unit_init(key, kh, kw, cin, cout):
    return {
        "w": _conv_init(key, kh, kw, cin, cout),
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def init_resnet(key, depth: int = 50, stem_out: int = 64,
                res2_out: int = 256) -> dict:
    blocks = BLOCKS_PER_STAGE[depth]
    keys = iter(jax.random.split(key, 4 + sum(blocks) * 4))
    params: dict = {"stem": _unit_init(next(keys), 7, 7, 3, stem_out)}
    cin = stem_out
    out = res2_out
    for si, stage in enumerate(["res2", "res3", "res4", "res5"]):
        mid = out // 4
        stage_blocks = []
        for bi in range(blocks[si]):
            bp = {
                "conv1": _unit_init(next(keys), 1, 1, cin, mid),
                "conv2": _unit_init(next(keys), 3, 3, mid, mid),
                "conv3": _unit_init(next(keys), 1, 1, mid, out),
            }
            # zero-init the residual branch's BN scale (the standard
            # zero-gamma trick): from-scratch activations stay bounded
            # through the residual stream — detectron2 never trains
            # FrozenBN from scratch, so this only affects cold starts and
            # is overwritten by any converted checkpoint
            bp["conv3"]["scale"] = jnp.zeros_like(bp["conv3"]["scale"])
            if bi == 0:
                bp["shortcut"] = _unit_init(next(keys), 1, 1, cin, out)
            stage_blocks.append(bp)
            cin = out
        params[stage] = stage_blocks
        out *= 2
    return params


def stop_gradient_frozen(params: dict, freeze_at: int = 2) -> dict:
    """Apply lax.stop_gradient to stem (+res2 when freeze_at>=2), emulating
    detectron2 BACKBONE.FREEZE_AT (detectron2_config_3bands.yaml:58)."""
    out = dict(params)
    if freeze_at >= 1:
        out["stem"] = jax.tree.map(jax.lax.stop_gradient, params["stem"])
    if freeze_at >= 2:
        out["res2"] = jax.tree.map(jax.lax.stop_gradient, params["res2"])
    return out
