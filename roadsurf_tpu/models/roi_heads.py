"""ROI heads: FastRCNNConvFCHead (box) + MaskRCNNConvUpsampleHead (mask).

Pinned behavior (reference detectron2_config_3bands.yaml:159-221): box head
ROIAlignV2 7x7 on P2-P5 -> 2x FC-1024 -> per-class scores and deltas
(weights 10,10,5,5); mask head ROIAlignV2 14x14 -> 4x conv-256 -> 2x deconv
-> per-class 28x28 masks. Inference keeps score>=0.05, class-wise NMS 0.5,
<=100 detections/image (detectron2_config_3bands.yaml:194,190,321).

All inference stages are fixed-shape (padded, masked) for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nms import NEG_INF, batched_nms_fixed
from ..ops.roi_align import roi_align_multilevel
from .anchors import apply_deltas, clip_boxes
from .resnet import conv


def _linear(x, p, dtype=jnp.bfloat16):
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    return y + p["b"].astype(jnp.float32)


def box_head_forward(params: dict, feats: list, boxes: jnp.ndarray,
                     cfg, dtype=jnp.bfloat16, use_pallas: bool = False,
                     qp: dict | None = None, feat_scales=None):
    """boxes (B, R, 4) -> (class_logits (B, R, C+1), deltas (B, R, C, 4)).

    ``qp``: calibrated int8 params for FC1/FC2 (models/quant.py,
    cfg.int8_scope "full"); the cls/bbox predictors always stay bf16.
    ``feat_scales``: per-level dequantization scales when ``feats`` are
    int8 pyramid levels (cfg.int8_pyramid)."""
    B, R = boxes.shape[:2]
    pooled = roi_align_multilevel(feats, boxes, cfg.box_pooler_resolution,
                                  sampling=cfg.pooler_sampling_ratio,
                                  canonical_size=cfg.canonical_box_size,
                                  canonical_level=cfg.canonical_level,
                                  use_pallas=use_pallas,
                                  feat_scales=feat_scales)
    x = pooled.reshape(B * R, -1)
    if qp is not None:
        from .quant import qlinear
        x = qlinear(x, qp["fc1"], relu=True)
        x = qlinear(x, qp["fc2"], relu=True)
    else:
        x = jnp.maximum(_linear(x, params["fc1"], dtype), 0.0)
        x = jnp.maximum(_linear(x, params["fc2"], dtype), 0.0)
    logits = _linear(x, params["cls"], dtype).reshape(B, R, -1)
    deltas = _linear(x, params["bbox"], dtype).reshape(
        B, R, cfg.num_classes, 4)
    return logits, deltas


def mask_head_forward(params: dict, feats: list, boxes: jnp.ndarray,
                      cfg, dtype=jnp.bfloat16, use_pallas: bool = False,
                      qp: dict | None = None, feat_scales=None):
    """boxes (B, D, 4) -> per-class mask logits (B, D, 2*res, 2*res, C).

    ``qp``: calibrated int8 params for the conv stack (models/quant.py,
    cfg.int8_scope "full"); deconv + predictor always stay bf16.
    ``feat_scales``: per-level dequantization scales for int8 pyramid
    levels (cfg.int8_pyramid)."""
    B, D = boxes.shape[:2]
    pooled = roi_align_multilevel(feats, boxes, cfg.mask_pooler_resolution,
                                  sampling=cfg.pooler_sampling_ratio,
                                  canonical_size=cfg.canonical_box_size,
                                  canonical_level=cfg.canonical_level,
                                  use_pallas=use_pallas,
                                  feat_scales=feat_scales)
    x = pooled.reshape(B * D, cfg.mask_pooler_resolution,
                       cfg.mask_pooler_resolution, -1).astype(dtype)
    if qp is not None:
        # streaming: conv_i's epilogue quantizes into conv_{i+1}'s int8
        # domain, skipping the bf16 round-trip between quantized convs.
        # With calibrated 'deconv'/'predictor' units (models/quant.py) the
        # stream stays int8 through the deconv and into the predictor —
        # the (R, 28, 28, 256) deconv output (the head's largest tensor)
        # never materializes bf16.
        from .quant import _quantize_act, qconv_int8_in, qdeconv_int8_in
        n = cfg.mask_num_conv
        tail = "deconv" in qp and "predictor" in qp
        xq = _quantize_act(x.astype(jnp.float32), qp["conv1"]["sa"])
        for i in range(n):
            if i + 1 < n:
                sa_out = qp[f"conv{i + 2}"]["sa"]
            else:
                sa_out = qp["deconv"]["sa"] if tail else None
            xq = qconv_int8_in(xq, qp[f"conv{i + 1}"], relu=True,
                               sa_out=sa_out)
        if tail:
            xq = qdeconv_int8_in(xq, qp["deconv"], relu=True,
                                 sa_out=qp["predictor"]["sa"])
            x = qconv_int8_in(xq, qp["predictor"], relu=False)
            res = 2 * cfg.mask_pooler_resolution
            return x.reshape(B, D, res, res, cfg.num_classes)
        x = xq                                # bf16 after the last conv
    else:
        for i in range(cfg.mask_num_conv):
            p = params[f"conv{i + 1}"]
            x = conv(x, p["w"], 1, dtype) + p["b"].astype(dtype)
            x = jnp.maximum(x, 0.0).astype(dtype)
    # 2x transposed conv (stride-2 deconv, kernel 2). transpose_kernel=True
    # + (kh, kw, out, in) kernel layout reproduces torch.nn.ConvTranspose2d
    # exactly (pinned empirically; with in==out==256 a layout mistake passes
    # shape checks silently — caught by the full-model torch parity test).
    # NOTE: a blocked-matmul rewrite (per-pixel contraction producing the
    # disjoint 2x2 output blocks, 1x1 predictor consumed in blocked layout)
    # was tried and measured 13% SLOWER whole-model — XLA's conv_transpose
    # lowering already fuses better than the hand-blocked dot here.
    p = params["deconv"]
    x = jax.lax.conv_transpose(
        x, p["w"].astype(dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True) \
        + p["b"].astype(dtype)
    x = jnp.maximum(x, 0.0).astype(dtype)
    p = params["predictor"]
    x = conv(x, p["w"], 1, dtype) + p["b"].astype(jnp.float32)
    res = 2 * cfg.mask_pooler_resolution
    return x.reshape(B, D, res, res, cfg.num_classes)


def inference_detections(class_logits, deltas, proposals, prop_scores, cfg,
                         image_size: int):
    """Per-image fixed-shape detection post-processing.

    class_logits (B, R, C+1), deltas (B, R, C, 4), proposals (B, R, 4).
    Returns dict with boxes (B, D, 4), scores (B, D), classes (B, D),
    valid (B, D) where D = cfg.detections_per_image.
    """
    B, R, Cp1 = class_logits.shape
    C = Cp1 - 1
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    scores = probs[..., :C]                     # drop background column
    # decode per-class boxes
    boxes = apply_deltas(deltas.astype(jnp.float32),
                         proposals[:, :, None, :], cfg.box_bbox_weights)
    boxes = clip_boxes(boxes, image_size, image_size)     # (B, R, C, 4)

    valid_prop = prop_scores > NEG_INF / 2

    flat_scores = jnp.where(
        valid_prop[:, :, None] & (scores >= cfg.score_thresh_test),
        scores, NEG_INF).reshape(B, R * C)
    flat_boxes = boxes.reshape(B, R * C, 4)
    flat_classes = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, None, :], (B, R, C)
    ).reshape(B, R * C)

    D = cfg.detections_per_image

    def one(bx, sc, cl):
        top_s, keep = batched_nms_fixed(bx, sc, cl, cfg.nms_thresh_test, D,
                                        fast=getattr(cfg, "fast_nms", False))
        return bx[keep], top_s, cl[keep]

    dboxes, dscores, dclasses = jax.vmap(one)(flat_boxes, flat_scores,
                                              flat_classes)
    return {
        "boxes": dboxes,
        "scores": jnp.where(dscores > NEG_INF / 2, dscores, 0.0),
        "classes": dclasses,
        "valid": dscores > NEG_INF / 2,
    }


# ---------------------------------------------------------------------------

def init_box_head(key, cfg, in_channels: int = 256) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    flat = in_channels * cfg.box_pooler_resolution ** 2

    def xavier(k, shape):
        import numpy as np
        lim = np.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    def normal(k, shape, std):
        return jax.random.normal(k, shape, jnp.float32) * std

    return {
        "fc1": {"w": xavier(k1, (flat, cfg.box_fc_dim)),
                "b": jnp.zeros((cfg.box_fc_dim,), jnp.float32)},
        "fc2": {"w": xavier(k2, (cfg.box_fc_dim, cfg.box_fc_dim)),
                "b": jnp.zeros((cfg.box_fc_dim,), jnp.float32)},
        "cls": {"w": normal(k3, (cfg.box_fc_dim, cfg.num_classes + 1), 0.01),
                "b": jnp.zeros((cfg.num_classes + 1,), jnp.float32)},
        "bbox": {"w": normal(k4, (cfg.box_fc_dim, cfg.num_classes * 4), 0.001),
                 "b": jnp.zeros((cfg.num_classes * 4,), jnp.float32)},
    }


def init_mask_head(key, cfg, in_channels: int = 256) -> dict:
    keys = jax.random.split(key, cfg.mask_num_conv + 2)

    def msra(k, shape):
        import numpy as np
        fan_out = shape[0] * shape[1] * shape[3]
        return jax.random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_out)

    params = {}
    cin = in_channels
    for i in range(cfg.mask_num_conv):
        params[f"conv{i + 1}"] = {
            "w": msra(keys[i], (3, 3, cin, cfg.mask_conv_dim)),
            "b": jnp.zeros((cfg.mask_conv_dim,), jnp.float32)}
        cin = cfg.mask_conv_dim
    # deconv kernel layout (kh, kw, out, in) — torch ConvTranspose2d
    # semantics under transpose_kernel=True (see mask_head_forward)
    params["deconv"] = {
        "w": msra(keys[-2], (2, 2, cfg.mask_conv_dim, cin)),
        "b": jnp.zeros((cfg.mask_conv_dim,), jnp.float32)}
    params["predictor"] = {
        "w": msra(keys[-1], (1, 1, cfg.mask_conv_dim, cfg.num_classes)),
        "b": jnp.zeros((cfg.num_classes,), jnp.float32)}
    return params
