#!/usr/bin/env python
"""Learning smoke proof: train the Mask R-CNN from scratch on synthetic
colored rectangles (ON-TPU, ~1 min) and verify the detections localize and
classify them.

This is the end-to-end "the framework learns" check: 500 SGD steps on
procedurally generated 64px tiles take the total loss from ~80 to <1 and the
trained detector recovers 16/16 ground-truth instances at mean IoU ~0.87
with correct classes (measured on a v5e chip). Run on TPU:

    python scripts/smoke_learning.py

(From-scratch notes baked into the config below: zero-gamma residual init is
in the model; inputs are std-normalized since the Caffe2-style pixel_std=1
convention of the reference assumes pretrained weights.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp, time
from dataclasses import replace
from roadsurf_tpu.models.config import fast_profile
from roadsurf_tpu.engine.train import init_train_state, make_train_step
from roadsurf_tpu.models.mask_rcnn import forward_inference

S, B, G = 64, 16, 2
cfg = replace(fast_profile(post_nms_topk=64),
              min_size_test=S, max_size_test=S,
              roi_batch_per_image=64, rpn_batch_per_image=32,
              detections_per_image=4, freeze_at=0,
              pixel_std=(57.375, 57.12, 58.395))
rng = np.random.default_rng(0)

def make_batch(n):
    imgs = rng.integers(0, 60, (n, S, S, 3), dtype=np.uint8)
    boxes = np.zeros((n, G, 4), np.float32)
    classes = np.zeros((n, G), np.int32)
    valid = np.zeros((n, G), bool)
    masks = np.zeros((n, G, S, S), np.uint8)
    for b in range(n):
        for g in range(G):
            w, h = rng.integers(14, 28, 2)
            x0 = rng.integers(0, S - w); y0 = rng.integers(0, S - h)
            cls = int(rng.integers(0, 2))
            color = (220, 60, 60) if cls == 0 else (60, 220, 60)
            imgs[b, y0:y0+h, x0:x0+w] = color
            boxes[b, g] = (x0, y0, x0+w, y0+h)
            classes[b, g] = cls
            valid[b, g] = True
            masks[b, g, y0:y0+h, x0:x0+w] = 1
    return {"image": imgs, "gt_boxes": boxes, "gt_classes": classes,
            "gt_valid": valid, "gt_masks": masks}

state = init_train_state(jax.random.PRNGKey(0), cfg)
cfg_t = replace(cfg, base_lr=0.005, warmup_iters=100)
step = jax.jit(make_train_step(cfg_t, S))
t0=time.time()
N_IT = 500
for it in range(N_IT):
    state, m = step(state, make_batch(B))
    if it % 50 == 0 or it == N_IT-1:
        print(f"it {it}: total={float(m['total']):.3f} cls={float(m['loss_cls']):.3f} rpn={float(m['loss_rpn_cls']):.3f} mask={float(m['loss_mask']):.3f} ({time.time()-t0:.0f}s)", flush=True)
print("train time", time.time()-t0, flush=True)
test = make_batch(8)
fn = jax.jit(lambda p, x: forward_inference(p, x, cfg, with_masks=False))
out = jax.device_get(fn(state["params"], test["image"]))
ious, correct, found = [], 0, 0
for b in range(8):
    for g in range(G):
        gt = test["gt_boxes"][b, g]
        best, bestc = 0.0, -1
        for d in range(4):
            if not out["valid"][b, d] or out["scores"][b, d] < 0.3: continue
            db = out["boxes"][b, d]
            xx0, yy0 = max(gt[0], db[0]), max(gt[1], db[1])
            xx1, yy1 = min(gt[2], db[2]), min(gt[3], db[3])
            inter = max(xx1-xx0, 0)*max(yy1-yy0, 0)
            u = (gt[2]-gt[0])*(gt[3]-gt[1]) + (db[2]-db[0])*(db[3]-db[1]) - inter
            if inter/u > best: best, bestc = inter/u, int(out["classes"][b, d])
        if best > 0.3:
            found += 1
            if bestc == test["gt_classes"][b, g]: correct += 1
        ious.append(best)
print(f"found {found}/16 GT (IoU>0.3), class-correct {correct}, mean IoU {np.mean(ious):.3f}")
