"""Microbench of the RPN proposal-selection stage (top-k / decode / NMS).

The fast-profile stage profile shows proposals (top-k + NMS) costing
~18 ms/batch-512 with zero MXU FLOPs. This script times the sub-steps
separately on synthetic RPN head outputs (shapes identical to the real
graph) so the cost is attributable:

  topk        per-level (approx) top-k over anchor scores
  +decode     + anchor gather, delta decode, clip, degenerate filter
  +nms        + level-aware sweep NMS + global top-k  (= full stage)

Measurement rules as bench.py (distinct inputs, scalar fetch).

Run:  python scripts/bench_proposals.py           (real TPU)
      BENCH_BATCH=512 BENCH_STEPS=4 python scripts/bench_proposals.py
"""

import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.models import fast_profile
    from roadsurf_tpu.models.anchors import (all_level_anchors, apply_deltas,
                                             clip_boxes)
    from roadsurf_tpu.models.rpn import select_proposals
    from roadsurf_tpu.ops.nms import NEG_INF

    cfg = fast_profile(post_nms_topk=int(os.environ.get("BENCH_TOPK", "32")))
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    S = cfg.min_size_test
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    sizes = [a.shape[0] for a in anchors]
    pre = cfg.rpn_pre_nms_topk_test

    # on-device input generation (host uploads of ~80 MB/set crawl over
    # the ~30 MB/s relay tunnel — see bench_pooler.py)
    def make_inputs(seed):
        @jax.jit
        def _gen(seed):
            key = jax.random.PRNGKey(seed)
            ks = jax.random.split(key, 2 * len(sizes))
            logits = [jax.random.normal(ks[2 * i], (batch, n), jnp.bfloat16)
                      for i, n in enumerate(sizes)]
            deltas = [0.1 * jax.random.normal(ks[2 * i + 1], (batch, n, 4),
                                              jnp.bfloat16)
                      for i, n in enumerate(sizes)]
            return logits, deltas
        out = _gen(seed)
        jax.block_until_ready(out)
        return out

    def st_topk(logits, deltas):
        out = []
        for lg in logits:
            n = lg.shape[1]
            k = min(pre, n)
            if n > 4 * k:
                sc, idx = jax.lax.approx_max_k(lg.astype(jnp.float32), k,
                                               recall_target=0.95)
            else:
                sc, idx = jax.lax.top_k(lg.astype(jnp.float32), k)
            out.append((sc, idx))
        return out

    def st_decode(logits, deltas):
        picked = st_topk(logits, deltas)
        out = []
        for (sc, idx), dl, an in zip(picked, deltas, anchors):
            an_j = jnp.asarray(an, jnp.float32)
            sel_anchors = an_j[idx]
            sel_deltas = jnp.take_along_axis(dl.astype(jnp.float32),
                                             idx[..., None], axis=1)
            boxes = apply_deltas(sel_deltas, sel_anchors)
            boxes = clip_boxes(boxes, S, S)
            wh_ok = ((boxes[..., 2] > boxes[..., 0])
                     & (boxes[..., 3] > boxes[..., 1]))
            out.append((boxes, jnp.where(wh_ok, sc, NEG_INF)))
        return out

    def st_full(logits, deltas):
        return select_proposals(logits, deltas, anchors, S, pre,
                                cfg.rpn_post_nms_topk_test,
                                cfg.rpn_nms_thresh, fast_nms=cfg.fast_nms)

    stages = [("topk", st_topk), ("+decode", st_decode), ("+nms=FULL", st_full)]

    dev = jax.devices()[0]
    print(f"device: {dev.platform}, batch={batch}, steps={steps}, "
          f"pre={pre}/level, post={cfg.rpn_post_nms_topk_test}",
          file=sys.stderr)
    inputs = [make_inputs(i) for i in range(steps + 1)]

    prev = 0.0
    for name, fn in stages:
        def scalar_fn(lg, dl, _fn=fn):
            out = _fn(lg, dl)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out))

        jfn = jax.jit(scalar_fn)
        float(jfn(*inputs[0]))
        t0 = time.perf_counter()
        for lg, dl in inputs[1:]:
            float(jfn(lg, dl))
        ms = (time.perf_counter() - t0) / steps * 1000.0
        print(f"{name:12s} {ms:8.2f} ms/batch  marginal {ms - prev:8.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
