"""Training-step throughput benchmark (real TPU).

Measures the jitted train step end to end — forward, losses, backward,
SGD update — at the reference's budget (batch 8,
/root/reference/config/detectron2_config_3bands.yaml:278-280) and at a
TPU-saturating batch, printing steps/s, tiles/s, and an MFU estimate from
XLA's own cost analysis.

Measurement rules as bench.py: distinct inputs per step (the relay caches
identical dispatches) and completion forced by fetching the loss scalar.

Run:  python scripts/bench_training.py
      BENCH_TRAIN_BATCHES=8,64 BENCH_STEPS=4 python scripts/bench_training.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e bf16 peak (measured on-chip at ~221 TF/s for deep conv chains;
# the marketing number is 197) — used only for the MFU estimate
_PEAK_FLOPS = 197e12


def synth_batch(rng, batch: int, size: int, max_instances: int = 16):
    """Random tiles with a few box+mask instances each (shapes identical
    to the COCO tile loader's output)."""
    imgs = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    boxes = np.zeros((batch, max_instances, 4), np.float32)
    classes = np.zeros((batch, max_instances), np.int32)
    valid = np.zeros((batch, max_instances), bool)
    masks = np.zeros((batch, max_instances, size, size), np.uint8)
    for b in range(batch):
        n = int(rng.integers(1, 4))
        for g in range(n):
            x0, y0 = rng.uniform(0, size * 0.6, 2)
            w, h = rng.uniform(size * 0.15, size * 0.4, 2)
            x1, y1 = min(x0 + w, size - 1), min(y0 + h, size - 1)
            boxes[b, g] = (x0, y0, x1, y1)
            classes[b, g] = int(rng.integers(0, 2))
            valid[b, g] = True
            masks[b, g, int(y0):int(y1), int(x0):int(x1)] = 1
    return {"image": imgs, "gt_boxes": boxes, "gt_classes": classes,
            "gt_valid": valid, "gt_masks": masks}


def bench_one(cfg, image_size: int, batch: int, steps: int, label: str,
              scan_k: int = 1):
    """``steps`` counts host dispatches; each dispatch runs ``scan_k``
    optimizer steps (lax.scan) so the dispatch-latency floor of the
    tunneled dev chip is amortized out of the per-step number."""
    import jax

    from roadsurf_tpu.engine.train import (init_train_state,
                                           make_train_scan_step,
                                           make_train_step)

    dev = jax.devices()[0]
    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg), dev)
    if scan_k > 1:
        step = jax.jit(make_train_scan_step(cfg, image_size, scan_k))

        def make_batch(rng):
            bs = [synth_batch(rng, batch, image_size) for _ in range(scan_k)]
            return jax.device_put(
                {k: np.stack([b[k] for b in bs]) for k in bs[0]}, dev)
    else:
        step = jax.jit(make_train_step(cfg, image_size))

        def make_batch(rng):
            return jax.device_put(synth_batch(rng, batch, image_size), dev)

    rng = np.random.default_rng(0)
    batches = [make_batch(rng) for _ in range(steps + 1)]

    flops = float("nan")
    try:
        cost = step.lower(state, batches[0]).compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
    except Exception:
        pass

    state, m = step(state, batches[0])            # compile + warm
    float(m["total"])
    t0 = time.perf_counter()
    for b in batches[1:]:
        state, m = step(state, b)
        float(m["total"])                         # forces completion
    dt = time.perf_counter() - t0

    steps_per_s = steps * max(scan_k, 1) / dt
    out = {
        "metric": f"train_step_{label}",
        "batch": batch,
        "image_size": image_size,
        "scan_k": scan_k,
        "steps_per_sec": round(steps_per_s, 3),
        "tiles_per_sec": round(steps_per_s * batch, 1),
        "step_ms": round(1000.0 / steps_per_s, 1),
    }
    if np.isfinite(flops):
        per_step = flops / max(scan_k, 1)
        out["gflop_per_step"] = round(per_step / 1e9, 1)
        out["mfu"] = round(per_step * steps_per_s / _PEAK_FLOPS, 4)
    print(json.dumps(out), flush=True)
    return out


def main():
    from roadsurf_tpu.models.config import ModelConfig

    steps = int(os.environ.get("BENCH_STEPS", "4"))
    batches = [int(b) for b in
               os.environ.get("BENCH_TRAIN_BATCHES", "8,64").split(",")]
    size = int(os.environ.get("BENCH_TRAIN_SIZE", "256"))

    from dataclasses import replace

    cfg = ModelConfig()         # reference solver/sampling budgets
    for batch in batches:
        # large tile batches need per-stage remat (the 1016-ROI box/mask
        # pooling's activations otherwise exceed HBM) plus mask-branch
        # chunking (even rematted, the 254-ROI deconv backward holds
        # ~95 MB/tile)
        c = (replace(cfg, train_remat=True,
                     train_head_chunks=max(1, batch // 8))
             if batch > 16 else cfg)
        scan_k = int(os.environ.get("BENCH_TRAIN_SCANK",
                                    "4" if batch <= 16 else "1"))
        bench_one(c, size, batch, steps,
                  f"{size}px" + ("_remat" if batch > 16 else ""),
                  scan_k=scan_k)


if __name__ == "__main__":
    main()
