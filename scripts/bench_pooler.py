"""RoIAlign pooler microbenchmark at deployment shapes (real TPU).

Compares the fused Pallas kernel against the XLA separable path at
several per-image chunk sizes, for the box head (P=7) and mask head
(P=14) geometries of the fast profile. Distinct inputs per step;
completion forced by a scalar fetch (see bench.py notes).

    BENCH_BATCH=512 python scripts/bench_pooler.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.ops.roi_align import (_level_assignment,
                                            _roi_align_separable)
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused

    B = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))

    # P2..P4 at 256px (the reachable levels), bf16 like the model
    sizes = [(64, 64), (32, 32), (16, 16)]
    C = 256

    # inputs are generated ON DEVICE: uploading host arrays for these
    # shapes (~1 GB per P2 map at batch 512) takes minutes over the
    # ~30 MB/s relay tunnel and was the dominant cost of this script
    @partial(jax.jit, static_argnums=(1,))
    def _gen(seed, R):
        key = jax.random.PRNGKey(seed)
        kf = jax.random.split(key, len(sizes) + 2)
        feats = tuple(
            jax.random.normal(kf[i], (B, h, w, C), jnp.bfloat16)
            for i, (h, w) in enumerate(sizes))
        x0 = jax.random.uniform(kf[-2], (B, R, 2), minval=0.0, maxval=200.0)
        wh = jax.random.uniform(kf[-1], (B, R, 2), minval=8.0, maxval=56.0)
        b = jnp.concatenate([x0, jnp.minimum(x0 + wh, 256.0)], -1)
        return feats, b.astype(jnp.float32)

    _seed = [0]

    def gen(R):
        _seed[0] += 1
        out = _gen(_seed[0], R)
        jax.block_until_ready(out)
        return out

    # separable cases first: the fused Pallas kernel has hung the relayed
    # backend before (a silent 40-min stall) — run it LAST so the XLA
    # numbers always land, and announce every case before compiling
    cases = []
    for R, P in ((32, 7), (64, 7), (8, 14)):
        for ic in (4, 16, 64):
            def sep(feats, boxes, _P=P, _ic=ic):
                lvl = _level_assignment(boxes, 224.0, 4, 2, 4)
                return _roi_align_separable(list(feats), boxes, lvl, _P, 2,
                                            2, img_chunk=_ic)
            cases.append((f"separable ic={ic} R={R} P={P}", jax.jit(sep), R))
    if os.environ.get("BENCH_PALLAS", "1") == "1":
        for R, P in ((32, 7), (64, 7), (8, 14)):
            cases.append((f"pallas R={R} P={P}",
                          jax.jit(partial(roi_align_fused, out_size=P,
                                          sampling=2)), R))

    only = os.environ.get("BENCH_CASES", "")
    if only:
        cases = [c for c in cases if only in c[0]]

    for name, fn, R in cases:
        ins = [gen(R) for _ in range(steps + 1)]
        print(f"... {name}: compiling", file=sys.stderr, flush=True)
        try:
            float(jnp.sum(fn(*ins[0])[..., 0]))   # compile+warm
            t0 = time.perf_counter()
            for f, b in ins[1:]:
                float(jnp.sum(fn(f, b)[..., 0]))
            ms = (time.perf_counter() - t0) / steps * 1000.0
            print(f"{name:28s} {ms:8.2f} ms/batch", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
