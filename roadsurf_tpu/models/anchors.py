"""Anchor generation and box transform math (detectron2-compatible).

Anchors: one size per FPN level (32..512, reference
detectron2_config_3bands.yaml:51-55), aspect ratios (0.5, 1, 2), offset 0.
Box deltas use the Faster R-CNN (dx, dy, dw, dh) parameterization with
configurable weights (RPN 1,1,1,1; box head 10,10,5,5)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# largest sane dw/dh (detectron2 _DEFAULT_SCALE_CLAMP = log(1000/16))
SCALE_CLAMP = math.log(1000.0 / 16.0)


def cell_anchors(size: float, aspect_ratios) -> np.ndarray:
    """(A, 4) XYXY anchors centered at origin, detectron2 parameterization:
    w = sqrt(area/aspect), h = aspect * w."""
    out = []
    area = float(size) ** 2
    for a in aspect_ratios:
        w = math.sqrt(area / a)
        h = a * w
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def level_anchors(feat_h: int, feat_w: int, stride: int, size: float,
                  aspect_ratios, offset: float = 0.0) -> np.ndarray:
    """All anchors for one feature level: (H*W*A, 4) XYXY, row-major over
    (y, x, a) matching the (H, W, A*4) head output layout."""
    base = cell_anchors(size, aspect_ratios)        # (A, 4)
    xs = (np.arange(feat_w, dtype=np.float32) + offset) * stride
    ys = (np.arange(feat_h, dtype=np.float32) + offset) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                      axis=-1).reshape(-1, 1, 4)    # (H*W, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def all_level_anchors(image_size: int, strides, sizes, aspect_ratios,
                      offset: float = 0.0) -> list[np.ndarray]:
    out = []
    for stride, size in zip(strides, sizes):
        fh = fw = (image_size + stride - 1) // stride
        out.append(level_anchors(fh, fw, stride, size, aspect_ratios, offset))
    return out


# ---------------------------------------------------------------------------
# delta <-> box

def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """deltas (..., 4), boxes (..., 4) XYXY -> decoded XYXY."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w,
        pred_ctr_y + 0.5 * pred_h,
    ], axis=-1)


def get_deltas(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode target boxes w.r.t. source boxes (both XYXY)."""
    wx, wy, ww, wh = weights
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h
    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h
    eps = 1e-8
    return jnp.stack([
        wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps),
        wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps),
        ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps)),
        wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps)),
    ], axis=-1)


def clip_boxes(boxes, h: float, w: float):
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w),
        jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w),
        jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def box_iou(a, b):
    """a (N, 4), b (M, 4) -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
