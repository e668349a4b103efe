"""Benchmark: Mask R-CNN R50-FPN tile-inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}

Baseline: the BASELINE.json north star of 5,000 256px tiles/sec/chip
(the reference publishes no throughput; its make_detections stage ran on a
single unspecified CUDA GPU).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.models import fast_profile, init_params, make_inference_fn

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    cfg = fast_profile()

    params = init_params(jax.random.PRNGKey(0), cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    fn = jax.jit(make_inference_fn(cfg, with_masks=True))

    images = np.random.randint(0, 255, (batch, 256, 256, 3), np.uint8)
    images = jax.device_put(jnp.asarray(images), dev)

    # warmup / compile
    out = fn(params, images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    tiles_per_sec = batch * iters / dt
    baseline = 5000.0
    print(json.dumps({
        "metric": "mask_rcnn_r50fpn_256px_tile_inference",
        "value": round(tiles_per_sec, 1),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tiles_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
