"""Pallas int8 GEMM microbench at the backbone's 1x1-conv shapes.

Round-4 established that XLA's int8 x int8 -> int32 *convs* run below the
bf16 rate at the real backbone shapes (scripts/bench_conv_dtypes.py), so
the quantized stack computes in bf16 (QCONV_COMPUTE='bf16'). But a 1x1
conv IS a GEMM — [B*H*W, Cin] x [Cin, Cout] — and the MXU's native int8
rate is 2x bf16 (~394 TOPS on v5e, verified in DESIGN.md 2c). This bench
asks whether a hand-tiled Pallas int8 GEMM recovers that rate where XLA's
conv lowering does not; if it does, quant.py's 1x1 path switches to it.

Variants per shape (M = B*H*W from the deployment batch-512 @256px):
  xla-bf16   int8 operands cast to bf16, XLA dot (the current _qconv path)
  xla-i8     int8 x int8 -> int32 XLA dot
  pl-i8      Pallas tiled int8 GEMM, int32 accumulation, f32 epilogue

Measurement discipline: lax.scan of K_REP GEMMs inside one dispatch with
per-iteration input perturbation (defeats the relay's dispatch cache),
scalar fetch to force completion (bench.py notes), marginal over steps.

Run: python scripts/bench_int8_gemm.py              (real TPU)
     BENCH_KREP=8 BENCH_STEPS=3 python scripts/bench_int8_gemm.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.ops.int8_gemm import int8_gemm

    K_REP = int(os.environ.get("BENCH_KREP", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))

    # (tag, M, K, N): the backbone 1x1 shapes at deployment batch 512
    # (M = 512*H*W), plus the box-head FC1 as an upper-size probe
    shapes = [
        ("C2 1x1 256>64",   512 * 64 * 64, 256, 64),
        ("C3 1x1 512>128",  512 * 32 * 32, 512, 128),
        ("C3 1x1 128>512",  512 * 32 * 32, 128, 512),
        ("C4 1x1 1024>256", 512 * 16 * 16, 1024, 256),
        ("C4 1x1 256>1024", 512 * 16 * 16, 256, 1024),
        ("C5 1x1 2048>512", 512 * 8 * 8, 2048, 512),
        ("boxFC1 16k ROIs", 512 * 32, 7 * 7 * 256, 1024),
    ]

    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)

    rng = np.random.default_rng(0)

    def bench(fn, mk, w, tag, flops, red=None):
        # reducer: XLA dots need a FULL reduction (jnp.sum fuses into the
        # dot's output loop; fetching y[0,0] lets XLA narrow the GEMM to
        # the elements feeding it — the advisor-r4 measurement trap); a
        # pallas_call body is opaque to XLA, so y[0,0] is safe there and
        # avoids charging the kernel an unfused [M,N] reduction pass.
        red = red or (lambda y: jnp.sum(y, dtype=jnp.float32))
        M, K = mk

        # device-side operand generation (the ~30 MB/s relay H2D link makes
        # host-built half-GB operands untimeable) + k-rep scan with a
        # per-iteration perturbation so the relay cannot cache the dispatch
        def krep(seed):
            a0 = jax.random.randint(jax.random.PRNGKey(seed), (M, K),
                                    -127, 127, jnp.int8)

            def body(carry, i):
                x = (carry + i.astype(jnp.int8))
                y = fn(x, w)
                return carry, red(y)
            _, ys = jax.lax.scan(body, a0,
                                 jnp.arange(K_REP, dtype=jnp.int8))
            return ys.sum()

        jf = jax.jit(krep)
        float(jf(0))  # compile+warm
        t0 = time.perf_counter()
        for s in range(1, steps + 1):
            acc = float(jf(s))
        dt = (time.perf_counter() - t0) / steps / K_REP
        tf = flops / dt / 1e12
        print(f"  {tag:10s} {dt * 1e3:7.2f} ms  {tf:6.1f} TF/s", flush=True)
        return dt

    for tag, M, K, N in shapes:
        flops = 2.0 * M * K * N
        print(f"{tag}  M={M} K={K} N={N}  {flops / 1e9:.0f} GFLOP",
              flush=True)
        mk = (M, K)
        w = jax.device_put(jnp.asarray(
            rng.integers(-127, 127, (K, N), np.int8)), dev)

        def xla_bf16(x, wq):
            return jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        def xla_i8(x, wq):
            return jnp.dot(x, wq, preferred_element_type=jnp.int32)

        bench(xla_bf16, mk, w, "xla-bf16", flops)
        bench(xla_i8, mk, w, "xla-i8", flops)
        bench(functools.partial(int8_gemm), mk, w, "pl-i8", flops,
              red=lambda y: y[0, 0].astype(jnp.float32))


if __name__ == "__main__":
    main()
