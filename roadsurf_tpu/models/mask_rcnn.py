"""GeneralizedRCNN (Mask R-CNN R50-FPN) — full inference assembly, TPU-native.

Replaces detectron2's GeneralizedRCNN meta-architecture (pinned at reference
detectron2_config_3bands.yaml:73) with a functional JAX model:

  uint8 tiles -> normalize (pixel means, detectron2_config_3bands.yaml:81-88)
  [-> optional resize to MIN_SIZE_TEST for parity] -> ResNet50+FPN
  -> RPN proposals -> box head -> fixed-shape class NMS (<=100/img)
  -> mask head on the detections -> 28x28 per-instance mask logits.

Everything is jit-compatible with static shapes; batch is the leading axis
and shards over the device mesh for data-parallel inference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .anchors import all_level_anchors
from .config import ModelConfig
from .fpn import fpn_forward, init_fpn
from .resnet import init_resnet, resnet_forward
from .roi_heads import (box_head_forward, inference_detections,
                        init_box_head, init_mask_head, mask_head_forward)
from .rpn import init_rpn, rpn_head_forward, select_proposals


def init_params(key, cfg: ModelConfig) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "backbone": init_resnet(k1),
        "fpn": init_fpn(k2, out_channels=cfg.fpn_channels),
        "rpn": init_rpn(k3, cfg.fpn_channels, cfg.num_anchors),
        "box_head": init_box_head(k4, cfg, cfg.fpn_channels),
        "mask_head": init_mask_head(k5, cfg, cfg.fpn_channels),
    }


def _bilinear_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) separable bilinear resize matrix (half-pixel centers,
    edge clamp — the jax.image.resize 'bilinear' convention, ≤2e-5
    relative difference from its renormalized edge rows)."""
    out = np.zeros((dst, src), np.float32)
    for i in range(dst):
        c = (i + 0.5) * src / dst - 0.5
        f = np.floor(c)
        w = c - f
        i0 = int(np.clip(f, 0, src - 1))
        i1 = int(np.clip(f + 1, 0, src - 1))
        out[i, i0] += 1 - w
        out[i, i1] += w
    return out


def preprocess(images: jnp.ndarray, cfg: ModelConfig,
               input_size: int) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) -> normalized float (B, S, S, 3).

    Matches the reference chain: tiles are decoded at 256px and resized so
    the shorter side is MIN_SIZE_TEST (detectron2_config_3bands.yaml:30);
    the fast profile keeps the native size (input_size == H). The resize
    runs as two static weight-matrix contractions (MXU) — jax.image.resize
    lowers to gathers that cost ~17 ms/batch-16 at 800px on v5e. The
    contractions are spelled as explicit (axis, batch*rest) matmuls rather
    than einsum over NHWC: with C=3 riding the lane dimension the einsum
    lowering ran ~6x slower on v5e when jitted in ISOLATION (124 vs ~1
    on-device ms/batch-16 at 256->800; inside the full inference graph XLA
    fuses either form equally well — parity e2e unchanged). The
    transpose+reshape form gives XLA a (dst, src) x (src, B*W*C) GEMM and
    agrees with the einsum form up to f32 reassociation (<=1e-4 on
    0..255-scale pixels, pinned by test)."""
    x = images.astype(jnp.float32)
    if input_size != images.shape[1]:
        B, H, Wd, C = x.shape
        wy = jnp.asarray(_bilinear_weights(H, input_size))
        wx = jnp.asarray(_bilinear_weights(Wd, input_size))
        a = jnp.transpose(x, (1, 0, 2, 3)).reshape(H, B * Wd * C)
        y = (wy @ a).reshape(input_size, B, Wd, C)
        b = jnp.transpose(y, (2, 1, 0, 3)).reshape(Wd, B * input_size * C)
        z = (wx @ b).reshape(input_size, B, input_size, C)
        x = jnp.transpose(z, (1, 2, 0, 3))
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    return (x - mean) / std


def _quant_tree(params, cfg) -> dict:
    """Resolve the calibrated int8 groups for this config (models/quant.py):
    params['quant'] for the scoped scheme, or the legacy params['backbone_q']
    when only int8_backbone is set. Empty dict = run bf16."""
    if getattr(cfg, "int8_scope", "") and "quant" in params:
        return params["quant"]
    if getattr(cfg, "int8_backbone", False):
        if "quant" in params:
            return {"backbone": params["quant"]["backbone"]}
        if "backbone_q" in params:
            return {"backbone": params["backbone_q"]}
    return {}


def forward_features(params, x, cfg, dtype, q: dict | None = None):
    q = q if q is not None else _quant_tree(params, cfg)
    if "backbone" in q:
        from .quant import resnet_forward_int8
        feats = resnet_forward_int8(q["backbone"], x)
    else:
        feats = resnet_forward(params["backbone"], x, dtype)
    if "fpn" in q:
        from .quant import fpn_forward_int8
        return fpn_forward_int8(q["fpn"], feats, dtype)
    return fpn_forward(params["fpn"], feats, dtype)


def forward_inference(params: dict, images: jnp.ndarray, cfg: ModelConfig,
                      with_masks: bool = True,
                      mask_format: str = "logits") -> dict:
    """images: (B, H, W, 3) uint8 tiles. Returns detection dict with boxes in
    *input image* coordinates (B, D, 4), plus scores/classes/valid and
    per-instance mask logits (B, D, 28, 28)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    native = images.shape[1]
    S = cfg.min_size_test if cfg.min_size_test else native

    q = _quant_tree(params, cfg)
    stem_u8 = q.get("backbone", {}).get("stem_u8")
    if (stem_u8 is not None and images.dtype == jnp.uint8
            and images.shape[1] == S and images.shape[2] == S
            and stem_u8["bias"].shape[0] == -(-S // 2)):
        # uint8-direct stem (quant.quantize_stem_u8): preprocess folds
        # into the quantized stem conv, raw tiles feed the backbone
        x = images
    else:
        x = preprocess(images, cfg, S).astype(dtype)
    pyr = q.get("pyr") if getattr(cfg, "int8_pyramid", False) else None
    feat_scales = None
    if pyr is not None:
        # int8-pyramid path: ResNet stage outputs, FPN internals and the
        # P-levels all stay int8; the RPN head and the poolers consume the
        # int8 levels directly (models/quant.py pyramid interface)
        from .quant import (fpn_forward_int8_pyr, resnet_forward_int8,
                            rpn_head_forward_int8_pyr)
        res_i8 = resnet_forward_int8(q["backbone"], x,
                                     out_sas=pyr["res_sa"])
        fpn_feats = fpn_forward_int8_pyr(q["fpn"], pyr, res_i8, dtype)
        logits, deltas = rpn_head_forward_int8_pyr(
            q["rpn"], pyr, fpn_feats, cfg.num_anchors, dtype)
        feat_scales = pyr["out_sa"]
    else:
        fpn_feats = forward_features(params, x, cfg, dtype, q=q)
        if "rpn" in q:
            from .quant import rpn_head_forward_int8
            logits, deltas = rpn_head_forward_int8(q["rpn"], fpn_feats,
                                                   cfg.num_anchors, dtype)
        else:
            logits, deltas = rpn_head_forward(params["rpn"], fpn_feats,
                                              cfg.num_anchors, dtype)
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    gate_geom = [(cfg.num_anchors, cfg.anchor_aspect_ratios, st, sz)
                 for st, sz in zip(cfg.fpn_strides, cfg.anchor_sizes)]
    proposals, prop_scores = select_proposals(
        logits, deltas, anchors, S, cfg.rpn_pre_nms_topk_test,
        cfg.rpn_post_nms_topk_test, cfg.rpn_nms_thresh,
        fast_nms=getattr(cfg, "fast_nms", False),
        local_max_gate=getattr(cfg, "rpn_local_max_gate", False),
        gate_geom=gate_geom)

    # fused Pallas pooler on real TPU (inference only — no VJP); the XLA
    # formulations serve CPU tests and the training path
    use_pallas = bool(getattr(cfg, "pallas_pooler", True)) \
        and jax.default_backend() == "tpu"

    box_feats = fpn_feats[:4]  # box/mask pool from P2..P5
    class_logits, box_deltas = box_head_forward(
        params["box_head"], box_feats, proposals, cfg, dtype,
        use_pallas=use_pallas, qp=q.get("box"), feat_scales=feat_scales)
    dets = inference_detections(class_logits, box_deltas, proposals,
                                prop_scores, cfg, S)

    if with_masks:
        mask_logits = mask_head_forward(params["mask_head"], box_feats,
                                        dets["boxes"], cfg, dtype,
                                        use_pallas=use_pallas,
                                        qp=q.get("mask"),
                                        feat_scales=feat_scales)
        # select each detection's own class channel
        cls = dets["classes"]
        masks = jnp.take_along_axis(
            mask_logits, cls[:, :, None, None, None], axis=-1)[..., 0]
        if mask_format in ("logits", "both"):
            dets["mask_logits"] = masks.astype(jnp.float32)
        if mask_format in ("u8", "both"):
            # uint8-quantized probabilities: what the host pipeline consumes
            # — 4x less device→host traffic than f32 logits, ≤1/255
            # probability error (irrelevant at the 0.5 paste threshold)
            dets["mask_probs_u8"] = jnp.round(
                jax.nn.sigmoid(masks.astype(jnp.float32)) * 255.0
            ).astype(jnp.uint8)
        if mask_format == "bits":
            # threshold at 0.5 ON DEVICE (sigmoid(x) >= 0.5 <=> x >= 0) and
            # bit-pack: 98 bytes/detection, 8x less d2h than u8 — for
            # latency/bandwidth-constrained links. Deviation from the
            # reference: it thresholds AFTER bilinear paste; binarizing at
            # 28x28 shifts boundaries <= half a mask cell — measured
            # quality-free: identical balanced F1 on all 5 paired seeds
            # (BASELINE.md, scripts/ablate_mask_bits.py). Host unpacks
            # with np.unpackbits(bitorder="little").
            B2, D2 = masks.shape[:2]
            bits = (masks.astype(jnp.float32) >= 0.0).reshape(
                B2, D2, -1, 8).astype(jnp.uint8)
            weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
            dets["mask_bits"] = jnp.sum(bits * weights, axis=-1,
                                        dtype=jnp.uint8)

    # report boxes in native tile coordinates
    scale = native / S
    dets["boxes"] = dets["boxes"] * scale
    return dets


from functools import lru_cache


@lru_cache(maxsize=32)
def make_inference_fn(cfg: ModelConfig, with_masks: bool = True,
                      mask_format: str = "logits"):
    """Returns a jittable fn(params, images)->detections.

    Cached per (cfg, with_masks) — ModelConfig is a frozen dataclass — so
    every engine/caller that jits the result shares one compilation cache
    entry instead of recompiling per instance.
    """
    return partial(forward_inference, cfg=cfg, with_masks=with_masks,
                   mask_format=mask_format)


@lru_cache(maxsize=32)
def jitted_inference_fn(cfg: ModelConfig, with_masks: bool = True,
                        mask_format: str = "logits"):
    """Process-wide jit wrapper cache: repeated engine constructions
    (variant sweeps, per-seed evaluation loops) reuse one compiled
    executable instead of retracing per instance."""
    return jax.jit(make_inference_fn(cfg, with_masks=with_masks,
                                     mask_format=mask_format))


@lru_cache(maxsize=32)
def make_inference_scan_fn(cfg: ModelConfig, with_masks: bool = True,
                           mask_format: str = "logits"):
    """Returns fn(params, images (k, B, H, W, 3)) -> detections stacked on
    a leading k axis.

    ``lax.map`` compiles the single-batch forward once and loops it
    ON-DEVICE, so the host pays ONE dispatch per k batches. On the relayed
    TPU the per-dispatch latency is ~25 ms — at a ~200 ms batch-512 step
    that is 12% of wall clock recovered for k≥4 — and on production
    hardware it likewise hides launch/transfer jitter. Working-set memory
    stays that of a single batch (the loop is sequential)."""
    base = make_inference_fn(cfg, with_masks=with_masks,
                             mask_format=mask_format)

    def fn(params, images):
        return jax.lax.map(lambda x: base(params, x), images)

    return fn
