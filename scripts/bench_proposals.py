"""Micro-bench of RPN proposal selection (the round-3 profile's top stage).

Times select_proposals and cumulative sub-stages on synthetic RPN head
outputs at the deployment shapes (batch 512, 256px, 5 levels), with the
bench.py measurement discipline (distinct inputs per step, scalar fetch).
The marginal between consecutive rows is that piece's cost.

Run:  python scripts/bench_proposals.py           (real TPU)
      BENCH_BATCH=512 BENCH_STEPS=4 python scripts/bench_proposals.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.models import fast_profile
    from roadsurf_tpu.models.anchors import (all_level_anchors, apply_deltas,
                                             clip_boxes)
    from roadsurf_tpu.models.rpn import _local_max_gate, select_proposals
    from roadsurf_tpu.ops.nms import NEG_INF, nms_sweep

    cfg = fast_profile(post_nms_topk=int(os.environ.get("BENCH_TOPK", "32")))
    B = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    S = cfg.min_size_test
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    gate_geom = [(cfg.num_anchors, cfg.anchor_aspect_ratios, st, sz)
                 for st, sz in zip(cfg.fpn_strides, cfg.anchor_sizes)]
    sizes = [S // st for st in cfg.fpn_strides]
    ns = [s * s * cfg.num_anchors for s in sizes]
    print(f"batch {B}, levels {ns}, pre {cfg.rpn_pre_nms_topk_test}, "
          f"post {cfg.rpn_post_nms_topk_test}")

    rng = np.random.default_rng(0)

    def mk_inputs(seed):
        r = np.random.default_rng(seed)
        logits = [jnp.asarray(r.normal(size=(B, n)).astype(np.float32),
                              jnp.bfloat16) for n in ns]
        deltas = [jnp.asarray(
            (r.normal(size=(B, n, 4)) * 0.2).astype(np.float32),
            jnp.bfloat16) for n in ns]
        return logits, deltas

    ins = [mk_inputs(s) for s in range(steps + 1)]
    for lg, dl in ins:
        jax.block_until_ready((lg, dl))

    pre, post = cfg.rpn_pre_nms_topk_test, cfg.rpn_post_nms_topk_test

    def st_gate(logits, deltas):
        out = []
        for l, lg in enumerate(logits):
            out.append(_local_max_gate(lg, *gate_geom[l], cfg.rpn_nms_thresh))
        return out

    def st_topk(logits, deltas):
        gated = st_gate(logits, deltas)
        out = []
        for lg in gated:
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
        sel = st_topk(logits, deltas)
        out = []
        for (sc, idx), dl, an in zip(sel, deltas, anchors):
            an_j = jnp.asarray(an, jnp.float32)
            sel_anchors = an_j[idx]
            sel_deltas = jnp.take_along_axis(dl.astype(jnp.float32),
                                             idx[..., None], axis=1)
            boxes = apply_deltas(sel_deltas, sel_anchors)
            boxes = clip_boxes(boxes, S, S)
            wh_ok = ((boxes[..., 2] > boxes[..., 0])
                     & (boxes[..., 3] > boxes[..., 1]))
            sc = jnp.where(wh_ok, sc, NEG_INF)
            out.append((boxes, sc))
        return out

    def st_full(logits, deltas):
        return select_proposals(logits, deltas, anchors, S, pre, post,
                                cfg.rpn_nms_thresh, fast_nms=True,
                                local_max_gate=True, gate_geom=gate_geom)

    def st_nil(logits, deltas):
        return [lg * 1.0 for lg in logits]

    stages = [("nil", st_nil), ("gate", st_gate), ("topk", st_topk),
              ("decode", st_decode), ("full", st_full)]
    prev = 0.0
    for name, fn in stages:
        def reduced(lg, dl, _fn=fn):
            # full reduction over EVERY element: a [0]-element fetch lets
            # XLA legally DCE/narrow the stage's elementwise work down to
            # the lanes feeding index 0, reading misleadingly low
            leaves = jax.tree_util.tree_leaves(_fn(lg, dl))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        jfn = jax.jit(reduced)
        float(jfn(*ins[0]))        # forces compile completion (relay gotcha)
        t0 = time.perf_counter()
        for s in range(steps):
            float(jfn(*ins[s + 1]))
        dt = (time.perf_counter() - t0) / steps * 1000
        print(f"{name:8s} {dt:8.2f} ms/batch   marginal {dt - prev:+8.2f}")
        prev = dt


if __name__ == "__main__":
    main()
