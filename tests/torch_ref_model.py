"""Torch reference Mask R-CNN R50-FPN forward (test oracle).

An independent CPU implementation of the exact inference architecture the
reference pins (detectron2 GeneralizedRCNN, config/detectron2_config_3bands
.yaml:73-321), assembled from torch convs (NCHW) plus naive,
spec-transcribed implementations of ROIAlignV2 (aligned=True bilinear,
per-sample-point loop) and greedy NMS — torchvision is not present in this
environment, so the custom ops are written straight from their published
semantics rather than shared with the JAX implementation.  It consumes a
detectron2-*named* state dict (see tests/test_torch_parity.py's
fabricator), so the same weights drive both stacks:

    d2 state dict ──merge_params──> roadsurf_tpu JAX model
                  ──this module───> torch oracle

Every stage returns its intermediates so tests can assert parity layer by
layer: FPN maps, RPN logits, proposals, detections, mask logits.

Only used by tests — the framework itself never imports torch for inference.
"""

from __future__ import annotations

import math

import numpy as np
import torch

# single-threaded torch: the oracle's OpenMP pool otherwise destabilizes
# the XLA CPU collective threads of later mesh tests in the same process
# (observed as a message-less native abort in test_short_training_run)
torch.set_num_threads(1)
import torch.nn.functional as F

SCALE_CLAMP = math.log(1000.0 / 16.0)


def _fold_bn(sd, name):
    w = sd[f"{name}.weight"]
    gamma = sd[f"{name}.norm.weight"]
    beta = sd[f"{name}.norm.bias"]
    mean = sd[f"{name}.norm.running_mean"]
    var = sd[f"{name}.norm.running_var"]
    scale = gamma / torch.sqrt(var + 1e-5)
    return w * scale[:, None, None, None], beta - mean * scale


def _conv_bn(x, sd, name, stride=1, relu=True):
    w, b = _fold_bn(sd, name)
    pad = w.shape[-1] // 2
    y = F.conv2d(x, w, b, stride=stride, padding=pad)
    return F.relu(y) if relu else y


def _bottleneck(x, sd, base, stride):
    out = _conv_bn(x, sd, f"{base}.conv1", stride=stride)
    out = _conv_bn(out, sd, f"{base}.conv2")
    out = _conv_bn(out, sd, f"{base}.conv3", relu=False)
    if f"{base}.shortcut.weight" in sd:
        sc = _conv_bn(x, sd, f"{base}.shortcut", stride=stride, relu=False)
    else:
        sc = x
    return F.relu(out + sc)


def resnet_fpn(sd, x):
    """x: (B, 3, H, W) normalized. Returns [P2..P6] NCHW."""
    x = _conv_bn(x, sd, "backbone.bottom_up.stem.conv1", stride=2)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = []
    blocks = (3, 4, 6, 3)
    for si, stage in enumerate(["res2", "res3", "res4", "res5"]):
        for bi in range(blocks[si]):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _bottleneck(x, sd, f"backbone.bottom_up.{stage}.{bi}", stride)
        feats.append(x)

    laterals = [
        F.conv2d(feats[i], sd[f"backbone.fpn_lateral{i + 2}.weight"],
                 sd[f"backbone.fpn_lateral{i + 2}.bias"])
        for i in range(4)
    ]
    tds = [None] * 4
    tds[3] = laterals[3]
    for i in (2, 1, 0):
        tds[i] = laterals[i] + F.interpolate(tds[i + 1], scale_factor=2,
                                             mode="nearest")
    outs = [
        F.conv2d(tds[i], sd[f"backbone.fpn_output{i + 2}.weight"],
                 sd[f"backbone.fpn_output{i + 2}.bias"], padding=1)
        for i in range(4)
    ]
    outs.append(F.max_pool2d(outs[3], 1, stride=2))
    return outs


def greedy_nms(boxes, scores, thresh):
    """Naive greedy NMS straight from the spec; returns keep indices in
    score-descending order."""
    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = ((boxes[:, 2] - boxes[:, 0]).clamp(min=0)
             * (boxes[:, 3] - boxes[:, 1]).clamp(min=0))
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        lt = torch.maximum(boxes[:, :2], boxes[i, :2])
        rb = torch.minimum(boxes[:, 2:], boxes[i, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        union = areas + areas[i] - inter
        iou = torch.where(union > 0, inter / union, torch.zeros(()))
        suppressed |= iou > thresh
    return torch.tensor(keep, dtype=torch.int64)


def batched_nms(boxes, scores, idxs, thresh):
    """Category-aware NMS: boxes of different idxs never interact."""
    if len(boxes) == 0:
        return torch.zeros(0, dtype=torch.int64)
    offs = idxs.to(boxes.dtype) * (boxes.max() + 1.0)
    return greedy_nms(boxes + offs[:, None], scores, thresh)


def roi_align(feat, boxes, out_size, spatial_scale, sampling_ratio=2,
              aligned=True):
    """ROIAlignV2 transcribed from the published op semantics (half-pixel
    alignment, samples outside [-1, size] dropped, taps clamped at the
    border, sample average per bin).  feat (1, C, H, W); boxes (K, 4) in
    image coordinates.  Returns (K, C, out_size, out_size).

    ``sampling_ratio=0`` follows the adaptive rule of the CUDA op: the
    per-axis count is ceil(bin size in feature cells), per ROI."""
    if sampling_ratio == 0:
        outs = []
        P = out_size
        for k in range(boxes.shape[0]):
            b1 = boxes[k:k + 1] * spatial_scale
            ny = max(int(math.ceil(float(b1[0, 3] - b1[0, 1]) / P)), 1)
            nx = max(int(math.ceil(float(b1[0, 2] - b1[0, 0]) / P)), 1)
            outs.append(_roi_align_fixed(feat, boxes[k:k + 1], out_size,
                                         spatial_scale, ny, nx, aligned))
        return torch.cat(outs, dim=0)
    return _roi_align_fixed(feat, boxes, out_size, spatial_scale,
                            sampling_ratio, sampling_ratio, aligned)


def _roi_align_fixed(feat, boxes, out_size, spatial_scale, sy_n, sx_n,
                     aligned=True):
    C, H, W = feat.shape[1:]
    off = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - off
    P = out_size
    bw = (b[:, 2] - b[:, 0]) / P
    bh = (b[:, 3] - b[:, 1]) / P
    ux = (torch.arange(P * sx_n, dtype=torch.float32) % sx_n + 0.5) / sx_n \
        + torch.arange(P * sx_n, dtype=torch.float32).div(sx_n,
                                                          rounding_mode="floor")
    uy = (torch.arange(P * sy_n, dtype=torch.float32) % sy_n + 0.5) / sy_n \
        + torch.arange(P * sy_n, dtype=torch.float32).div(sy_n,
                                                          rounding_mode="floor")
    sx = b[:, 0:1] + ux[None] * bw[:, None]                    # (K, P*sx_n)
    sy = b[:, 1:2] + uy[None] * bh[:, None]

    def taps(c, size):
        valid = (c >= -1.0) & (c <= float(size))
        cc = c.clamp(0.0, size - 1.0)
        lo = cc.floor()
        w_hi = torch.where(valid, cc - lo, torch.zeros(()))
        w_lo = torch.where(valid, 1.0 - (cc - lo), torch.zeros(()))
        lo = lo.long()
        hi = (lo + 1).clamp(max=size - 1)
        return lo, hi, w_lo, w_hi

    ix0, ix1, wx0, wx1 = taps(sx, W)
    iy0, iy1, wy0, wy1 = taps(sy, H)
    flat = feat[0].reshape(C, H * W)

    def corner(iy, wy, ix, wx):
        idx = iy[:, :, None] * W + ix[:, None, :]              # (K, S, S)
        vals = flat[:, idx.reshape(-1)].reshape(C, *idx.shape)
        return vals * (wy[:, :, None] * wx[:, None, :])[None]

    acc = (corner(iy0, wy0, ix0, wx0) + corner(iy0, wy0, ix1, wx1)
           + corner(iy1, wy1, ix0, wx0) + corner(iy1, wy1, ix1, wx1))
    K = boxes.shape[0]
    acc = acc.reshape(C, K, P, sy_n, P, sx_n).mean(dim=(3, 5))
    return acc.permute(1, 0, 2, 3)


def cell_anchors(size, aspect_ratios):
    out = []
    area = float(size) ** 2
    for a in aspect_ratios:
        w = math.sqrt(area / a)
        h = a * w
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return torch.tensor(out, dtype=torch.float32)


def level_anchors(fh, fw, stride, size, aspect_ratios, offset=0.0):
    base = cell_anchors(size, aspect_ratios)
    xs = (torch.arange(fw, dtype=torch.float32) + offset) * stride
    ys = (torch.arange(fh, dtype=torch.float32) + offset) * stride
    sy, sx = torch.meshgrid(ys, xs, indexing="ij")
    shifts = torch.stack([sx, sy, sx, sy], dim=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def apply_deltas(deltas, boxes, weights=(1., 1., 1., 1.)):
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = torch.clamp(deltas[:, 2] / ww, max=SCALE_CLAMP)
    dh = torch.clamp(deltas[:, 3] / wh, max=SCALE_CLAMP)
    pcx, pcy = dx * widths + cx, dy * heights + cy
    pw, ph = torch.exp(dw) * widths, torch.exp(dh) * heights
    return torch.stack([pcx - pw / 2, pcy - ph / 2,
                        pcx + pw / 2, pcy + ph / 2], dim=-1)


def rpn_forward(sd, fpn):
    logits, deltas = [], []
    for f in fpn:
        t = F.relu(F.conv2d(f, sd["proposal_generator.rpn_head.conv.weight"],
                            sd["proposal_generator.rpn_head.conv.bias"],
                            padding=1))
        o = F.conv2d(t, sd["proposal_generator.rpn_head."
                           "objectness_logits.weight"],
                     sd["proposal_generator.rpn_head.objectness_logits.bias"])
        d = F.conv2d(t, sd["proposal_generator.rpn_head."
                           "anchor_deltas.weight"],
                     sd["proposal_generator.rpn_head.anchor_deltas.bias"])
        # (B, A, H, W) -> (B, H*W*A) matching the NHWC row-major layout
        B, A, H, W = o.shape
        logits.append(o.permute(0, 2, 3, 1).reshape(B, H * W * A))
        deltas.append(d.permute(0, 2, 3, 1).reshape(B, H * W * A, 4))
    return logits, deltas


def select_proposals(logits, deltas, anchors, image_size, pre_nms, post_nms,
                     nms_thresh=0.7):
    """detectron2 find_top_rpn_proposals (test mode), batch size 1."""
    boxes_all, scores_all, lvl_all = [], [], []
    for li, (lg, dl, an) in enumerate(zip(logits, deltas, anchors)):
        sc = lg[0]
        k = min(pre_nms, sc.shape[0])
        top, idx = sc.topk(k)
        bx = apply_deltas(dl[0][idx], an[idx])
        bx[:, 0::2] = bx[:, 0::2].clamp(0, image_size)
        bx[:, 1::2] = bx[:, 1::2].clamp(0, image_size)
        ok = (bx[:, 2] > bx[:, 0]) & (bx[:, 3] > bx[:, 1])
        boxes_all.append(bx[ok])
        scores_all.append(top[ok])
        lvl_all.append(torch.full((int(ok.sum()),), li))
    boxes = torch.cat(boxes_all)
    scores = torch.cat(scores_all)
    lvls = torch.cat(lvl_all)
    keep = batched_nms(boxes, scores, lvls, nms_thresh)
    keep = keep[:post_nms]
    return boxes[keep], scores[keep]


def assign_levels(boxes, canonical_size=224, canonical_level=4):
    w = (boxes[:, 2] - boxes[:, 0]).clamp(min=0)
    h = (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    lvl = torch.floor(canonical_level
                      + torch.log2(torch.sqrt(w * h) / canonical_size + 1e-8))
    return lvl.clamp(2, 5).to(torch.int64) - 2


def multilevel_roi_align(fpn4, boxes, out_size, sampling=0):
    """Naive roi_align over P2..P5 with canonical level assignment."""
    lvl = assign_levels(boxes)
    out = boxes.new_zeros(boxes.shape[0], fpn4[0].shape[1],
                          out_size, out_size)
    for li, f in enumerate(fpn4):
        sel = (lvl == li).nonzero(as_tuple=True)[0]
        if not len(sel):
            continue
        out[sel] = roi_align(f, boxes[sel], out_size,
                             spatial_scale=1.0 / (2 ** (li + 2)),
                             sampling_ratio=sampling, aligned=True)
    return out


def box_head(sd, fpn4, proposals, num_classes, image_size,
             score_thresh=0.05, nms_thresh=0.5, max_dets=100):
    """FastRCNNConvFCHead + fast_rcnn_inference (detectron2 semantics)."""
    pooled = multilevel_roi_align(fpn4, proposals, 7)
    x = pooled.flatten(1)
    x = F.relu(F.linear(x, sd["roi_heads.box_head.fc1.weight"],
                        sd["roi_heads.box_head.fc1.bias"]))
    x = F.relu(F.linear(x, sd["roi_heads.box_head.fc2.weight"],
                        sd["roi_heads.box_head.fc2.bias"]))
    logits = F.linear(x, sd["roi_heads.box_predictor.cls_score.weight"],
                      sd["roi_heads.box_predictor.cls_score.bias"])
    dts = F.linear(x, sd["roi_heads.box_predictor.bbox_pred.weight"],
                   sd["roi_heads.box_predictor.bbox_pred.bias"])
    probs = logits.softmax(-1)[:, :num_classes]          # drop background
    R = proposals.shape[0]
    boxes = torch.stack([
        apply_deltas(dts[:, 4 * c:4 * c + 4], proposals,
                     weights=(10., 10., 5., 5.))
        for c in range(num_classes)], dim=1)             # (R, C, 4)
    boxes[..., 0::2] = boxes[..., 0::2].clamp(0, image_size)
    boxes[..., 1::2] = boxes[..., 1::2].clamp(0, image_size)

    flat_boxes = boxes.reshape(R * num_classes, 4)
    flat_scores = probs.reshape(-1)
    flat_cls = (torch.arange(num_classes)
                .repeat(R))
    keep = flat_scores >= score_thresh
    fb, fs, fc = flat_boxes[keep], flat_scores[keep], flat_cls[keep]
    kept = batched_nms(fb, fs, fc, nms_thresh)[:max_dets]
    return fb[kept], fs[kept], fc[kept]


def mask_head(sd, fpn4, boxes, classes):
    pooled = multilevel_roi_align(fpn4, boxes, 14)
    x = pooled
    for i in range(1, 5):
        x = F.relu(F.conv2d(x, sd[f"roi_heads.mask_head.mask_fcn{i}.weight"],
                            sd[f"roi_heads.mask_head.mask_fcn{i}.bias"],
                            padding=1))
    x = F.relu(F.conv_transpose2d(x, sd["roi_heads.mask_head.deconv.weight"],
                                  sd["roi_heads.mask_head.deconv.bias"],
                                  stride=2))
    x = F.conv2d(x, sd["roi_heads.mask_head.predictor.weight"],
                 sd["roi_heads.mask_head.predictor.bias"])
    return x[torch.arange(len(classes)), classes]        # (D, 28, 28)


@torch.no_grad()
def full_forward(sd, image_u8, num_classes, pixel_mean, pixel_std,
                 anchor_sizes=(32, 64, 128, 256, 512),
                 aspect_ratios=(0.5, 1.0, 2.0),
                 pre_nms=1000, post_nms=1000, score_thresh=0.05,
                 max_dets=100):
    """image_u8: (H, W, 3) uint8. Returns dict of every intermediate."""
    S = image_u8.shape[0]
    x = torch.from_numpy(image_u8.astype(np.float32)).permute(2, 0, 1)[None]
    mean = torch.tensor(pixel_mean).reshape(1, 3, 1, 1)
    std = torch.tensor(pixel_std).reshape(1, 3, 1, 1)
    x = (x - mean) / std

    fpn = resnet_fpn(sd, x)
    logits, deltas = rpn_forward(sd, fpn)
    anchors = [level_anchors(f.shape[2], f.shape[3], 2 ** (i + 2),
                             anchor_sizes[i], aspect_ratios)
               for i, f in enumerate(fpn)]
    proposals, prop_scores = select_proposals(logits, deltas, anchors, S,
                                              pre_nms, post_nms)
    boxes, scores, classes = box_head(sd, fpn[:4], proposals, num_classes, S,
                                      score_thresh=score_thresh,
                                      max_dets=max_dets)
    masks = mask_head(sd, fpn[:4], boxes, classes)
    return {
        "fpn": [f.numpy() for f in fpn],
        "rpn_logits": [l.numpy() for l in logits],
        "proposals": proposals.numpy(),
        "prop_scores": prop_scores.numpy(),
        "boxes": boxes.numpy(),
        "scores": scores.numpy(),
        "classes": classes.numpy(),
        "mask_logits": masks.numpy(),
    }
