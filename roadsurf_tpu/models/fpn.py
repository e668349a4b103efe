"""Feature Pyramid Network head over the ResNet backbone (NHWC, XLA-fused).

Pinned behavior (reference detectron2_config_3bands.yaml:61-69): lateral 1x1
convs on res2..res5 to 256 channels, top-down nearest-2x upsampling with sum
fusion, 3x3 output convs, and P6 = stride-2 maxpool of P5 (LastLevelMaxPool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import conv


def _conv_b(x, p, dtype=jnp.bfloat16):
    y = conv(x, p["w"], 1, dtype)
    return (y + p["b"].astype(dtype)).astype(dtype)


def upsample2x_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def fpn_forward(params: dict, feats: dict, dtype=jnp.bfloat16) -> list:
    """feats: {'res2'..'res5'}; returns [P2, P3, P4, P5, P6] NHWC."""
    names = ["res2", "res3", "res4", "res5"]
    laterals = [
        _conv_b(feats[n], params[f"lateral{i + 2}"], dtype)
        for i, n in enumerate(names)
    ]
    # top-down pathway
    tds = [None] * 4
    tds[3] = laterals[3]
    for i in (2, 1, 0):
        tds[i] = (laterals[i]
                  + upsample2x_nearest(tds[i + 1])
                  ).astype(dtype)
    outs = [
        _conv_b(tds[i], params[f"output{i + 2}"], dtype) for i in range(4)
    ]
    p6 = jax.lax.reduce_window(
        outs[3], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "VALID")
    outs.append(p6)
    return outs


def init_fpn(key, in_channels=(256, 512, 1024, 2048), out_channels=256):
    keys = iter(jax.random.split(key, 8))
    params = {}
    for i, cin in enumerate(in_channels):
        # detectron2 FPN uses Caffe2XavierFill (fan-in uniform) for laterals
        k = next(keys)
        lim = np.sqrt(6.0 / cin)
        params[f"lateral{i + 2}"] = {
            "w": jax.random.uniform(k, (1, 1, cin, out_channels), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((out_channels,), jnp.float32),
        }
        k = next(keys)
        lim = np.sqrt(6.0 / (9 * out_channels))
        params[f"output{i + 2}"] = {
            "w": jax.random.uniform(k, (3, 3, out_channels, out_channels),
                                    jnp.float32, -lim, lim),
            "b": jnp.zeros((out_channels,), jnp.float32),
        }
    return params
