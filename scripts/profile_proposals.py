"""Sub-stage profile of RPN proposal selection (the round-4 target stage).

Feeds synthetic RPN head outputs (realistic shapes for the fast profile at
batch 512) straight into pieces of models/rpn.select_proposals, timing each
cumulative sub-graph with the same discipline as bench.py (distinct inputs
per step, scalar fetch forces completion). The marginal column between
adjacent rows is that sub-stage's cost; the "noop" row is the relay
dispatch floor — subtract it when reading absolute costs.

Run:  python scripts/profile_proposals.py
      BENCH_BATCH=512 BENCH_STEPS=4 python scripts/profile_proposals.py
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
    from roadsurf_tpu.ops.nms import NEG_INF, nms_sweep

    cfg = fast_profile(post_nms_topk=int(os.environ.get("BENCH_TOPK", "32")))
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    S = cfg.min_size_test
    pre_k = cfg.rpn_pre_nms_topk_test
    post_k = cfg.rpn_post_nms_topk_test
    A = cfg.num_anchors

    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    sizes = [a.shape[0] for a in anchors]
    print(f"batch={batch} pre_k={pre_k} post_k={post_k} levels={sizes}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def mk_inputs():
        logits = [jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32)
                              ).astype(jnp.bfloat16) for n in sizes]
        deltas = [jnp.asarray(
            rng.normal(scale=0.3, size=(batch, n, 4)).astype(np.float32)
        ).astype(jnp.bfloat16) for n in sizes]
        return jax.device_put((logits, deltas), dev)

    inputs = [mk_inputs() for _ in range(steps + 1)]

    def st_noop(logits, deltas):
        return [lg[:, :1] for lg in logits]

    def _topk(logits):
        out = []
        for lg in logits:
            n = lg.shape[1]
            k = min(pre_k, n)
            if n > 4 * k:
                sc, idx = jax.lax.approx_max_k(lg.astype(jnp.float32), k,
                                               recall_target=0.95)
            else:
                sc, idx = jax.lax.top_k(lg.astype(jnp.float32), k)
            out.append((sc, idx))
        return out

    def st_topk(logits, deltas):
        return [sc for sc, _ in _topk(logits)]

    def _decode(logits, deltas):
        sel = _topk(logits)
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

    def st_gather_only(logits, deltas):
        sel = _topk(logits)
        out = []
        for (sc, idx), dl, an in zip(sel, deltas, anchors):
            an_j = jnp.asarray(an, jnp.float32)
            out.append(an_j[idx])
            out.append(jnp.take_along_axis(dl.astype(jnp.float32),
                                           idx[..., None], axis=1))
        return out

    def st_decode(logits, deltas):
        return [x for pair in _decode(logits, deltas) for x in pair]

    def _nms(logits, deltas):
        lv = _decode(logits, deltas)
        kept_boxes, kept_scores = [], []
        for b_l, s_l in lv:
            k_out = min(post_k, b_l.shape[1])

            def one_level(b, s, _k=k_out):
                top_s, keep_i = nms_sweep(b, s, cfg.rpn_nms_thresh, _k)
                return b[keep_i], top_s

            kb, ks = jax.vmap(one_level)(b_l, s_l)
            kept_boxes.append(kb)
            kept_scores.append(ks)
        return kept_boxes, kept_scores

    def st_nms(logits, deltas):
        kb, ks = _nms(logits, deltas)
        return kb + ks

    def st_full(logits, deltas):
        kb, ks = _nms(logits, deltas)
        boxes = jnp.concatenate(kb, axis=1)
        scores = jnp.concatenate(ks, axis=1)
        pscores, top_i = jax.lax.top_k(scores, post_k)
        pboxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        return [pboxes, pscores]

    stages = [
        ("noop(dispatch floor)", st_noop),
        ("topk", st_topk),
        ("topk+gather", st_gather_only),
        ("topk+gather+decode", st_decode),
        ("+per-level sweep NMS", st_nms),
        ("+global topk = FULL", st_full),
    ]

    prev_ms = 0.0
    rows = []
    for name, fn in stages:
        def scalar_fn(lg, dl, _fn=fn):
            out = _fn(lg, dl)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out))

        jfn = jax.jit(scalar_fn)
        lg0, dl0 = inputs[0]
        float(jfn(lg0, dl0))  # warm/compile
        t0 = time.perf_counter()
        for lg, dl in inputs[1:]:
            float(jfn(lg, dl))
        dt = time.perf_counter() - t0
        ms = dt / steps * 1000.0
        marg = ms - prev_ms
        rows.append((name, ms, marg))
        prev_ms = ms
        print(f"{name:28s} {ms:9.2f} ms/batch  marginal {marg:8.2f} ms",
              file=sys.stderr)

    print("\nsub-stage                     ms/batch  marginal_ms")
    for name, ms, marg in rows:
        print(f"{name:28s} {ms:9.2f} {marg:12.2f}")


if __name__ == "__main__":
    main()
