"""Conv dtype-path microbench: int8-compute vs int8-storage/bf16-compute.

Round-4 finding to validate: XLA's int8 conv (int8 x int8 -> int32) runs
BELOW the bf16 MXU rate on this stack (measured ~125 TF/s at C=256 and
~39 TF/s at C=64 vs bf16 at ~201 TF/s = peak). If that holds at the real
backbone shapes, the deployment graph should keep int8 HBM *storage* but
cast operands to bf16 at the conv (the convert fuses into the conv's
operand read), i.e. compute every conv in bf16.

Variants per shape:
  i8/i32   int8 x int8 -> int32 (current _qconv path, quant.py:186)
  i8>bf16  int8 operands .astype(bf16) -> bf16 conv -> f32 acc
  bf16     pure bf16 operands (storage cost 2x, upper bound for compute)

Measurement: lax.scan of K_REP iterations inside one dispatch (per-iter
input perturbation defeats the relay's dispatch cache), scalar fetch to
force completion, marginal over steps. FLOPs = 2*B*Ho*Wo*kh*kw*Cin*Cout.

Run: python scripts/bench_conv_dtypes.py            (real TPU)
     BENCH_KREP=8 BENCH_STEPS=3 python scripts/bench_conv_dtypes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    K_REP = int(os.environ.get("BENCH_KREP", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))

    # (tag, B, H, W, Cin, Cout, k, stride) — deployment batch 512 @256px
    shapes = [
        ("C2 3x3 64",    512, 64, 64, 64, 64, 3, 1),
        ("C2 1x1 64>256", 512, 64, 64, 64, 256, 1, 1),
        ("C3 3x3 128",   512, 32, 32, 128, 128, 3, 1),
        ("C4 3x3 256",   512, 16, 16, 256, 256, 3, 1),
        ("C5 3x3 512",   512, 8, 8, 512, 512, 3, 1),
        ("FPN out 3x3",  512, 64, 64, 256, 256, 3, 1),
        ("FPN lat C5",   512, 8, 8, 2048, 256, 1, 1),
    ]

    def gen(seed, shape, dt):
        @jax.jit
        def _g(s):
            x = jax.random.normal(jax.random.PRNGKey(s), shape, jnp.float32)
            return (x * 3).astype(dt)
        out = _g(seed)
        jax.block_until_ready(out)
        return out

    def timed(fn, ins):
        jfn = jax.jit(fn)
        float(jfn(*ins[0]))
        t0 = time.perf_counter()
        for s in range(steps):
            float(jfn(*ins[s + 1]))
        return (time.perf_counter() - t0) / steps / K_REP * 1000

    for tag, B, H, W, Ci, Co, k, st in shapes:
        fl = 2 * B * (H // st) * (W // st) * k * k * Ci * Co
        pad = [(k // 2, k // 2)] * 2 if k > 1 else "VALID"

        def conv(x, w, acc):
            return jax.lax.conv_general_dilated(
                x, w, (st, st), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)

        def scanner(op):
            def fn(x, w):
                def body(c, i):
                    xp = x + i.astype(x.dtype)
                    return c + op(xp, w), None
                tot, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(K_REP))
                return tot
            return fn

        rows = []
        ins8 = [(gen(s, (B, H, W, Ci), jnp.int8),
                 gen(100 + s, (k, k, Ci, Co), jnp.int8))
                for s in range(steps + 1)]
        op = lambda x, w: conv(x, w, jnp.int32).astype(jnp.float32).ravel()[0]
        rows.append(("i8/i32", timed(scanner(op), ins8)))

        op = lambda x, w: conv(x.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16),
                               jnp.float32).ravel()[0]
        rows.append(("i8>bf16", timed(scanner(op), ins8)))

        insb = [(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
                for a, b in ins8]
        for t in insb:
            jax.block_until_ready(t)
        op = lambda x, w: conv(x, w, jnp.float32).ravel()[0]
        rows.append(("bf16", timed(scanner(op), insb)))

        msg = "  ".join(f"{n} {ms:6.3f}ms={fl/ms/1e9:4.0f}TF/s"
                        for n, ms in rows)
        print(f"{tag:16s} {msg}", flush=True)


if __name__ == "__main__":
    main()
