#!/usr/bin/env python
"""Validate + time the blocked Pallas pooler on real TPU at parity shapes.

The 800px parity profile (reference detectron2_config_3bands.yaml:30,
MIN_SIZE_TEST=800, 1000 proposals) pools from 200/100/50/25-px FPN maps.
This script compiles ``roi_align_fused_blocked`` with Mosaic at exactly
those shapes, asserts numerics against the exact XLA separable path, and
times both — the go/no-go gate before the parity bench adopts the kernel.

    python scripts/check_blocked_pooler_tpu.py [--roi 1000] [--batch 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--roi", type=int, default=1000)
    ap.add_argument("--chan", type=int, default=256)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="int8 pyramid levels + feat_scales (the parity "
                         "int8_pyramid path)")
    ap.add_argument("--rb", type=int, default=0, help="ROI block override")
    ap.add_argument("--rbx", type=int, default=16)
    ap.add_argument("--samplings", default="0,2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.ops.roi_align import (_level_assignment,
                                            _roi_align_separable)
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused_blocked

    dev = jax.devices()[0]
    print("backend:", dev.platform, flush=True)

    B, R, C, S = args.batch, args.roi, args.chan, args.size
    sizes = [(S // 2 ** l, S // 2 ** l) for l in range(2, 6)]
    rng = np.random.default_rng(0)
    feats = tuple(jax.device_put(jnp.asarray(
        rng.normal(size=(B, h, w, C)).astype(np.float32),
        dtype=jnp.bfloat16), dev) for h, w in sizes)

    # road-like boxes: elongated thin roads + assorted scales + edge cases
    def one_batch():
        bs = [[0.0, 0.0, S, S], [0.0, 100.0, S, 106.0],
              [40.0, 0.0, 43.0, S], [0.0, 0.0, 2.0, 2.0]]
        for _ in range(R - len(bs)):
            x0, y0 = rng.uniform(0, S - 2, 2)
            bs.append([x0, y0, min(S, x0 + rng.uniform(0.5, S / 2)),
                       min(S, y0 + rng.uniform(0.5, S / 2))])
        return bs

    boxes = jax.device_put(jnp.asarray(
        np.asarray([one_batch() for _ in range(B)], np.float32)), dev)

    scales = None
    feats_dq = feats
    if args.int8:
        scl = np.asarray([0.05, 0.08, 0.11, 0.07], np.float32)
        feats = tuple(jax.device_put(jnp.asarray(np.clip(
            np.round(np.asarray(f, np.float32) / s), -127, 127)
            .astype(np.int8)), dev) for f, s in zip(feats, scl))
        feats_dq = tuple((f.astype(jnp.float32) * s).astype(jnp.bfloat16)
                         for f, s in zip(feats, scl))
        scales = tuple(scl.tolist())
    rb = args.rb or None

    for sampling in (int(s) for s in args.samplings.split(",")):
        t0 = time.perf_counter()
        got = roi_align_fused_blocked(feats, boxes, 7, sampling=sampling,
                                      feat_scales=scales, rb=rb,
                                      rbx=args.rbx)
        got_np = np.asarray(got, np.float32)
        print(f"blocked sampling={sampling}: compile+run "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        lvl = _level_assignment(boxes, 224, 4, 2, 5)
        sep = jax.jit(lambda f, b, l: _roi_align_separable(
            list(f), b, l, 7, sampling, 2))
        ref_np = np.asarray(sep(feats_dq, boxes, lvl), np.float32)
        err = np.max(np.abs(got_np - ref_np))
        print(f"  max |blocked - separable| = {err:.4f}", flush=True)
        assert err < 0.05, err

        # steady-state timing, distinct inputs, forced completion
        def timed(fn, tag):
            ins = [jax.device_put(b + i * 0.125, dev)
                   for i, b in [(i, boxes) for i in range(args.steps)]]
            float(jnp.sum(fn(ins[0])))          # warm
            t0 = time.perf_counter()
            acc = 0.0
            for x in ins:
                acc += float(jnp.sum(fn(x)))
            dt = (time.perf_counter() - t0) / args.steps
            print(f"  {tag}: {dt * 1e3:.1f} ms/batch-{B} "
                  f"({B / dt:.1f} img/s)", flush=True)

        timed(lambda b: roi_align_fused_blocked(feats, b, 7,
                                                sampling=sampling,
                                                feat_scales=scales, rb=rb,
                                                rbx=args.rbx),
              f"blocked s={sampling} int8={bool(scales)} "
              f"rb={rb} rbx={args.rbx}")
        if not args.int8:
            timed(lambda b: sep(feats, b,
                                _level_assignment(b, 224, 4, 2, 5)),
                  f"separable s={sampling}")

    print("OK", flush=True)


if __name__ == "__main__":
    main()
