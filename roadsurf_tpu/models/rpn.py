"""Region Proposal Network (StandardRPNHead + proposal selection), TPU-native.

Pinned behavior (reference detectron2_config_3bands.yaml:222-251): shared
3x3 conv head over P2..P6, 3 anchors per cell, IoU thresholds 0.3/0.7,
NMS 0.7, pre/post top-k 2000-1000/1000, delta weights (1,1,1,1).

Everything runs at fixed shapes: per-level top-k pads with -inf scores, NMS
is the fixed-shape XLA loop from ops.nms, and the final proposal tensor is
always (B, post_nms_topk, 4).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import NEG_INF, nms_fixed, nms_sweep
from .anchors import apply_deltas, clip_boxes
from .resnet import conv


def rpn_head_forward(params: dict, feats: list, num_anchors: int = 3,
                     dtype=jnp.bfloat16):
    """Returns per-level (objectness (B,H,W,A), deltas (B,H,W,A,4))."""
    logits, deltas = [], []
    for f in feats:
        t = conv(f, params["conv"]["w"], 1, dtype)
        t = jnp.maximum(t + params["conv"]["b"].astype(dtype), 0.0)
        t = t.astype(dtype)
        o = conv(t, params["objectness"]["w"], 1, dtype) \
            + params["objectness"]["b"].astype(dtype)
        d = conv(t, params["deltas"]["w"], 1, dtype) \
            + params["deltas"]["b"].astype(dtype)
        b, h, w, _ = o.shape
        logits.append(o.reshape(b, h * w * num_anchors))
        deltas.append(d.reshape(b, h * w * num_anchors, 4))
    return logits, deltas


def _local_max_gate(lg: jnp.ndarray, num_anchors: int, aspect_ratios,
                    stride: int, size: float, nms_thresh: float
                    ) -> jnp.ndarray:
    """Spatial local-max pre-gate for the sweep-NMS path.

    Adjacent same-aspect anchors one stride apart are geometrically
    guaranteed to overlap above the NMS threshold when
    (side − stride)/(side + stride) > thresh along the shift axis — at the
    pinned geometry (size/stride = 8 on every level,
    detectron2_config_3bands.yaml:40-55, thresh 0.7) that holds for the
    square AR along both axes (7/9 ≈ 0.778) and for the elongated ARs along
    their LONG axis only (≈0.838; the short axis is ≈0.6996, just under).
    Under single-sweep suppression (ops.nms.nms_sweep: a box dies iff ANY
    higher-priority box overlaps it, kept or not), an anchor with a
    higher-priority guaranteed-overlap neighbor therefore cannot survive —
    so masking it to NEG_INF *before* the pre-NMS top-k is exact w.r.t. the
    anchor-geometry sweep, and lets the top-k budget shrink ~4x without
    spending it on NMS-doomed duplicates. (Decoded boxes can drift from
    anchor geometry; the 5-seed ablation guards that approximation.)

    Tie-breaking matches nms_sweep's score-then-flat-index priority: the
    (y, x, a) row-major layout makes up/left neighbors lower-index (win
    ties) and down/right higher-index (lose ties).
    """
    B, n = lg.shape
    A = num_anchors
    hw = n // A
    side = int(round(math.sqrt(hw)))
    if side * side != hw:
        return lg          # non-square level: gate does not apply
    area = float(size) ** 2
    horiz, vert = [], []
    for a in aspect_ratios:
        w = math.sqrt(area / a)
        h = a * w
        horiz.append((w - stride) / (w + stride) > nms_thresh)
        vert.append((h - stride) / (h + stride) > nms_thresh)
    if not (any(horiz) or any(vert)):
        return lg
    x = lg.reshape(B, side, side, A)
    neg = jnp.asarray(NEG_INF, x.dtype)
    pad_r = jnp.full_like(x[:, :1], neg)
    pad_c = jnp.full_like(x[:, :, :1], neg)
    up = jnp.concatenate([pad_r, x[:, :-1]], axis=1)
    down = jnp.concatenate([x[:, 1:], pad_r], axis=1)
    left = jnp.concatenate([pad_c, x[:, :, :-1]], axis=2)
    right = jnp.concatenate([x[:, :, 1:], pad_c], axis=2)
    h_ok = jnp.asarray(horiz)        # (A,)
    v_ok = jnp.asarray(vert)
    drop = (h_ok & ((left >= x) | (right > x))) \
        | (v_ok & ((up >= x) | (down > x)))
    return jnp.where(drop, neg, x).reshape(B, n)


def select_proposals(logits: list, deltas: list, anchors: list,
                     image_size: int, pre_nms_topk: int, post_nms_topk: int,
                     nms_thresh: float, fast_nms: bool = False,
                     local_max_gate: bool = False,
                     gate_geom: list | None = None):
    """Decode + per-level top-k + level-aware NMS + global top-k.

    anchors: per-level (N_l, 4) numpy arrays. Returns (boxes (B, K, 4),
    scores (B, K)) with K = post_nms_topk; padding scores are NEG_INF.

    local_max_gate (sweep path only): mask anchors that a same-level
    spatial neighbor is geometrically guaranteed to sweep-suppress, BEFORE
    the pre-NMS top-k (see _local_max_gate) — needs ``gate_geom``, a
    per-level list of (num_anchors, aspect_ratios, stride, size).
    """
    B = logits[0].shape[0]
    use_gate = local_max_gate and fast_nms and gate_geom is not None
    all_boxes, all_scores, all_lvl = [], [], []
    for l, (lg, dl, an) in enumerate(zip(logits, deltas, anchors)):
        if use_gate:
            lg = _local_max_gate(lg, *gate_geom[l], nms_thresh)
        n = lg.shape[1]
        k = min(pre_nms_topk, n)
        if fast_nms and n > 4 * k:
            # TPU-native approximate top-k for the large fine levels (the
            # exact bitonic sort over P2's ~12k anchors dominates proposal
            # cost); recall 0.95 of candidate *anchors* — the post-NMS
            # proposal set is insensitive to tail candidates
            sc, idx = jax.lax.approx_max_k(lg.astype(jnp.float32), k,
                                           recall_target=0.95)
        else:
            sc, idx = jax.lax.top_k(lg.astype(jnp.float32), k)  # (B, k)
        an_j = jnp.asarray(an, jnp.float32)
        sel_anchors = an_j[idx]                                 # (B, k, 4)
        sel_deltas = jnp.take_along_axis(dl.astype(jnp.float32), idx[..., None],
                                         axis=1)
        boxes = apply_deltas(sel_deltas, sel_anchors)
        boxes = clip_boxes(boxes, image_size, image_size)
        # drop degenerate boxes (MIN_SIZE=0 => only empty ones)
        wh_ok = ((boxes[..., 2] > boxes[..., 0])
                 & (boxes[..., 3] > boxes[..., 1]))
        sc = jnp.where(wh_ok, sc, NEG_INF)
        all_boxes.append(boxes)
        all_scores.append(sc)
        all_lvl.append(jnp.full((B, k), l, jnp.int32))
    # Level-aware NMS, block-diagonal form: boxes on different levels never
    # suppress each other, so the batched coordinate-offset NMS over the
    # concatenated N = Σ k_l candidates (O(N²) pairs) decomposes EXACTLY
    # into per-level NMS (Σ k_l² pairs — 5× fewer at equal level budgets)
    # + a global top-k over each level's top-`post_nms_topk` survivors: a
    # survivor in the global top-k is necessarily in its level's top-k.
    # Tie ordering matches the concatenated form (level-major, then index).
    nms_one = nms_sweep if fast_nms else nms_fixed
    kept_boxes, kept_scores = [], []
    for b_l, s_l in zip(all_boxes, all_scores):
        k_out = min(post_nms_topk, b_l.shape[1])

        def one_level(b, s, _k=k_out):
            top_s, keep_i = nms_one(b, s, nms_thresh, _k)
            return b[keep_i], top_s

        kb, ks = jax.vmap(one_level)(b_l, s_l)
        kept_boxes.append(kb)
        kept_scores.append(ks)
    boxes = jnp.concatenate(kept_boxes, axis=1)
    scores = jnp.concatenate(kept_scores, axis=1)
    pscores, top_i = jax.lax.top_k(scores, post_nms_topk)
    pboxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    return pboxes, pscores


def init_rpn(key, channels: int = 256, num_anchors: int = 3) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)

    def normal(k, shape, std=0.01):
        return jax.random.normal(k, shape, jnp.float32) * std

    return {
        "conv": {"w": normal(k1, (3, 3, channels, channels)),
                 "b": jnp.zeros((channels,), jnp.float32)},
        "objectness": {"w": normal(k2, (1, 1, channels, num_anchors)),
                       "b": jnp.zeros((num_anchors,), jnp.float32)},
        "deltas": {"w": normal(k3, (1, 1, channels, num_anchors * 4)),
                   "b": jnp.zeros((num_anchors * 4,), jnp.float32)},
    }
