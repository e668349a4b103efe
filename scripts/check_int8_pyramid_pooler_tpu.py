#!/usr/bin/env python
"""Validate the Mosaic-compiled fused pooler on int8 pyramid levels
(real TPU).

tests/test_model.py covers the int8-pyramid fused pooler only in interpret
mode; this script is the compiled-path gate (advisor r3 finding): it runs
``roi_align_fused`` with int8 feature blocks at the deployment shapes
(including P5's 8x8xC block against int8 (32,128) VMEM tiling) and asserts
numerics against the XLA separable path over the dequantized levels.

    python scripts/check_int8_pyramid_pooler_tpu.py [--batch 64] [--roi 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--roi", type=int, default=32)
    ap.add_argument("--chan", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--res", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.ops.roi_align import (_level_assignment,
                                            _roi_align_separable)
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused

    dev = jax.devices()[0]
    print("backend:", dev.platform, flush=True)
    if dev.platform != "tpu":
        raise SystemExit("needs a real TPU (Mosaic-compiled path)")

    B, R, C, S = args.batch, args.roi, args.chan, args.size
    sizes = [S // 2 ** l for l in range(2, 6)]          # 64, 32, 16, 8
    rng = np.random.default_rng(0)
    feats_i8 = tuple(jax.device_put(jnp.asarray(
        rng.integers(-127, 127, (B, h, h, C), dtype=np.int8)), dev)
        for h in sizes)
    scales = np.asarray([0.031, 0.017, 0.042, 0.009], np.float32)

    # road-like boxes spread over all pyramid levels (incl. P5-sized)
    bs = []
    for _ in range(B):
        rows = [[0.0, 0.0, S, S], [0.0, 100.0, S, 106.0],
                [40.0, 0.0, 43.0, S], [1.0, 1.0, 9.0, 9.0]]
        for _ in range(R - len(rows)):
            x0, y0 = rng.uniform(0, S - 2, 2)
            rows.append([x0, y0, min(S, x0 + rng.uniform(4, S * 0.9)),
                         min(S, y0 + rng.uniform(4, S * 0.9))])
        bs.append(rows)
    boxes = jax.device_put(jnp.asarray(np.asarray(bs, np.float32)), dev)

    for res in (args.res, 14):
        fused = jax.jit(lambda f, b, _r=res: roi_align_fused(
            f, b, _r, sampling=2, feat_scales=tuple(scales)))
        got = np.asarray(fused(feats_i8, boxes))

        feats_f = [f.astype(jnp.float32) * s
                   for f, s in zip(feats_i8, scales)]
        lvl = _level_assignment(boxes, 224, 4, 2, 5)
        ref = np.asarray(_roi_align_separable(feats_f, boxes, lvl, res, 2,
                                              min_level=2))
        err = np.max(np.abs(got.astype(np.float32) - ref))
        scale = max(np.max(np.abs(ref)), 1e-6)
        print(f"res={res}: max |err| {err:.5f} (rel {err / scale:.2e})")
        assert err / scale < 2e-2, f"compiled int8 pooler mismatch at {res}"
    print("OK: compiled int8-pyramid fused pooler matches the XLA path")


if __name__ == "__main__":
    main()
