"""Per-branch cost attribution of the training step (batch 8, 256px,
reference budgets): times jax.grad of cumulative loss subsets so each
row's marginal is that branch's forward+backward cost.

Run: python scripts/profile_training.py  [BENCH_BATCH=8 BENCH_STEPS=4]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.engine.train import compute_losses, init_train_state
    from roadsurf_tpu.models.config import ModelConfig, fast_profile

    B = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    S = 256
    cfg = fast_profile()     # reference budgets for sampling/solver
    from dataclasses import replace
    cfg = replace(cfg,
                  rpn_pre_nms_topk_train=2000, rpn_post_nms_topk_train=1000,
                  roi_batch_per_image=1024, rpn_batch_per_image=256,
                  train_head_chunks=int(os.environ.get("BENCH_CHUNKS", "1")),
                  train_remat=os.environ.get("BENCH_REMAT", "0") == "1")

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    dev = jax.devices()[0]
    params = jax.device_put(state["params"], dev)

    rng = np.random.default_rng(0)

    def mk_batch():
        g = 8
        boxes = rng.uniform(8, 200, (B, g, 4)).astype(np.float32)
        boxes = np.stack([np.minimum(boxes[..., 0], boxes[..., 2]),
                          np.minimum(boxes[..., 1], boxes[..., 3]),
                          np.maximum(boxes[..., 0], boxes[..., 2]) + 16,
                          np.maximum(boxes[..., 1], boxes[..., 3]) + 16], -1)
        return jax.device_put({
            "image": rng.integers(0, 255, (B, S, S, 3), np.uint8),
            "gt_boxes": boxes.astype(np.float32),
            "gt_classes": rng.integers(0, 2, (B, g)).astype(np.int32),
            "gt_valid": np.ones((B, g), bool),
            "gt_masks": rng.integers(0, 2, (B, g, S, S)).astype(np.uint8),
        }, dev)

    batches = [mk_batch() for _ in range(steps + 1)]
    key = jax.random.PRNGKey(3)

    subsets = [
        ("rpn only (bb+fpn+rpn fwd+bwd)", ("loss_rpn_cls", "loss_rpn_loc")),
        ("+box head", ("loss_rpn_cls", "loss_rpn_loc", "loss_cls",
                       "loss_box_reg")),
        ("+mask branch = FULL", ("loss_rpn_cls", "loss_rpn_loc", "loss_cls",
                                 "loss_box_reg", "loss_mask")),
    ]

    prev = 0.0
    rows = []
    print(f"batch={B} chunks={cfg.train_head_chunks} "
          f"remat={cfg.train_remat}", file=sys.stderr)
    for name, keys in subsets:
        def loss_fn(p, b, _keys=keys):
            losses = compute_losses(p, b, key, cfg, S)
            return sum(losses[k] for k in _keys)

        gfn = jax.jit(lambda p, b: jax.tree.map(
            lambda g: jnp.sum(jnp.abs(g.astype(jnp.float32))),
            jax.grad(loss_fn)(p, b)))
        try:
            comp = jax.jit(jax.grad(loss_fn)).lower(
                params, batches[0]).compile().cost_analysis()
            tf = comp.get("flops", 0.0) / 1e12
        except Exception:
            tf = float("nan")
        out = gfn(params, batches[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for b in batches[1:]:
            jax.block_until_ready(gfn(params, b))
        ms = (time.perf_counter() - t0) / steps * 1000.0
        rows.append((name, ms, ms - prev, tf))
        prev = ms
        print(f"{name:32s} {ms:9.2f} ms  marginal {ms - prev:8.2f}  "
              f"{tf:6.2f} TFLOP", file=sys.stderr)

    print("\nbranch                           ms/step  marginal_ms  TFLOP")
    for name, ms, marg, tf in rows:
        print(f"{name:32s} {ms:9.2f} {marg:11.2f} {tf:7.2f}")


if __name__ == "__main__":
    main()
