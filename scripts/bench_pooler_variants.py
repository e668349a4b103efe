"""Attribute the fused pooler's kernel time to its internal stages.

Runs ``roi_align_fused`` at the deployment box-pooler shape (batch 512,
R=32, P=7, P2..P4 at 256px) with the ``stage`` profiling knob ("w" =
weight build only, "y" = +y-matmul, "yr" = +relayout, "full") and a few
structural variants (rbx, bf16 output). Non-"full" stages compute wrong
results on purpose — this is a timing attribution tool, not a benchmark
of record. Inputs are generated on device (see bench_pooler.py note on
the relay uplink); each step still pays the relay's ~25 ms dispatch
latency, which is common to every row and cancels in differences.

    python scripts/bench_pooler_variants.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.ops.roi_align_pallas import (roi_align_fused,
                                                   roi_align_fused_blocked)

    B = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    # BENCH_POOLER=mask benches the mask-pooler shape (R=8 detections,
    # P=14) instead of the box-pooler default (R=32 proposals, P=7)
    R, P = (8, 14) if os.environ.get("BENCH_POOLER", "box") == "mask" \
        else (32, 7)
    sizes = [(64, 64), (32, 32), (16, 16)]
    C = 256

    # BENCH_INT8=1: int8 pyramid levels + per-level scales, the
    # deployment input (halves the kernel's feature DMA)
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    feat_scales = jnp.asarray([0.11, 0.23, 0.47], jnp.float32) \
        if int8 else None

    @partial(jax.jit, static_argnums=(1,))
    def _gen(seed, R):
        key = jax.random.PRNGKey(seed)
        kf = jax.random.split(key, len(sizes) + 2)
        if int8:
            feats = tuple(
                jax.random.randint(kf[i], (B, h, w, C), -127, 128,
                                   jnp.int32).astype(jnp.int8)
                for i, (h, w) in enumerate(sizes))
        else:
            feats = tuple(
                jax.random.normal(kf[i], (B, h, w, C), jnp.bfloat16)
                for i, (h, w) in enumerate(sizes))
        x0 = jax.random.uniform(kf[-2], (B, R, 2), minval=0.0, maxval=200.0)
        wh = jax.random.uniform(kf[-1], (B, R, 2), minval=8.0, maxval=56.0)
        b = jnp.concatenate([x0, jnp.minimum(x0 + wh, 256.0)], -1)
        return feats, b.astype(jnp.float32)

    seed = [0]

    def gen():
        seed[0] += 1
        out = _gen(seed[0], R)
        jax.block_until_ready(out)
        return out

    cases = [
        ("stage=y", dict(stage="y")),
        ("stage=yr", dict(stage="yr")),
        ("stage=yr relay=t", dict(stage="yr", relayout="t")),
        ("full", dict()),
        ("full relay=t", dict(relayout="t")),
        ("full relay=t gb=8", dict(relayout="t", gb=8)),
        ("full rbx=8", dict(rbx=8)),
        ("full rbx=32", dict(rbx=32)),
        ("full out=bf16", dict(out_dtype=jnp.bfloat16)),
    ]
    for gb in (2, 4, 8, 16, 32):
        if B % gb == 0:
            cases.append((f"full gb={gb}", dict(gb=gb)))
    for rb in (32, 64):
        cases.append((f"blocked rb={rb}", dict(rb=rb)))

    only = os.environ.get("BENCH_CASES", "")
    for name, kw in cases:
        if only and only not in name:
            continue
        base = roi_align_fused_blocked if name.startswith("blocked") \
            else roi_align_fused

        def _call(f, b, _kw=kw, _base=base):
            if feat_scales is not None and _base is roi_align_fused:
                _kw = dict(_kw, feat_scales=feat_scales)
            return _base(f, b, out_size=P, sampling=2, **_kw)

        fn = jax.jit(_call)
        ins = [gen() for _ in range(steps + 1)]
        print(f"... {name}: compiling", file=sys.stderr, flush=True)
        try:
            float(jnp.sum(fn(*ins[0])[..., 0].astype(jnp.float32)))
            t0 = time.perf_counter()
            for f, b in ins[1:]:
                float(jnp.sum(fn(f, b)[..., 0].astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / steps * 1000.0
            print(f"{name:16s} {ms:8.2f} ms/batch", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
