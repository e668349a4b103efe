"""Tiled Pallas int8 GEMM with int32 accumulation and a fused epilogue.

Why this exists: the quantized backbone's 1x1 convs are GEMMs —
``[B*H*W, Cin] x [Cin, Cout]`` — and the v5e MXU runs int8 at 2x the bf16
rate (~394 TOPS vs ~197 TF/s), but XLA's int8 conv/dot lowering measures
BELOW the bf16 rate at the real shapes (scripts/bench_conv_dtypes.py,
round 4), which forced quant.py to compute in bf16 (QCONV_COMPUTE). This
kernel hand-tiles the int8 dot so the MXU sees native (32, 128) int8
tiles, accumulates int32 in VMEM, and fuses the dequant epilogue
(per-output-channel multiplier + bias + ReLU + optional requantize to the
consumer's int8 domain) into the last K step — the int32 accumulator
never reaches HBM.

Semantics (matching quant.py's epilogue chain, quant.py:227-247):
    acc  = sum_k a[m, k] * w[k, n]                    (int32, exact)
    y    = acc * mult[n] + bias[n]                     (f32)
    y    = max(y, 0)                                   if relu
    out  = clip(round(y), -127, 127)  int8             if quantize
         | y  bf16                                     otherwise
Requantization into a consumer scale sa_out is expressed by folding it
into the epilogue: pass mult/sa_out and bias/sa_out with quantize=True
(ReLU commutes with the positive 1/sa_out scaling, so relu-then-divide
equals divide-then-relu). With mult=None the raw int32 accumulator is
returned (microbench mode).

Shape contract: M % bm == 0, K % bk == 0, N % bn == 0 after the tile
sizes are clamped to the operand sizes; callers pad M (the pixel axis)
up — channel axes in the quantized stack are already multiples of 64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, w_ref, mult_ref, bias_ref, o_ref, acc_ref, *,
            nk: int, relu: bool, quantize: bool, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _epilogue():
        acc = acc_ref[:]
        if mult_ref is None:
            o_ref[:] = acc.astype(out_dtype)
            return
        y = acc.astype(jnp.float32) * mult_ref[0, :][None, :] \
            + bias_ref[0, :][None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        if quantize:
            o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        else:
            o_ref[:] = y.astype(out_dtype)


def _fit(pref: int, n: int) -> int:
    """Largest power-of-two tile <= pref that divides n (>= 8)."""
    t = min(pref, n)
    while t > 8 and n % t:
        t //= 2
    return t


@functools.partial(
    jax.jit, static_argnames=("relu", "quantize", "bm", "bn", "bk",
                              "interpret"))
def int8_gemm(a: jnp.ndarray, w: jnp.ndarray,
              mult: jnp.ndarray | None = None,
              bias: jnp.ndarray | None = None,
              relu: bool = False, quantize: bool = False,
              bm: int = 512, bn: int = 256, bk: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """a: (M, K) int8, w: (K, N) int8; see module docstring for epilogue.

    Returns (M, N): int32 (mult is None), bf16 (mult given), or int8
    (quantize=True).
    """
    M, K = a.shape
    K2, N = w.shape
    assert K == K2, (a.shape, w.shape)
    bm, bn, bk = _fit(bm, M), _fit(bn, N), _fit(bk, K)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, \
        (M, K, N, bm, bk, bn)
    nm, nn, nk = M // bm, N // bn, K // bk

    if mult is None:
        out_dtype = jnp.int32
    elif quantize:
        out_dtype = jnp.int8
    else:
        out_dtype = jnp.bfloat16

    in_specs = [
        pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
        pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
    ]
    args = [a, w]
    if mult is not None:
        bias = jnp.zeros((N,), jnp.float32) if bias is None else bias
        in_specs += [
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ]
        args += [mult.astype(jnp.float32).reshape(1, N),
                 bias.astype(jnp.float32).reshape(1, N)]
        kernel = functools.partial(
            _kernel, nk=nk, relu=relu, quantize=quantize,
            out_dtype=out_dtype)
    else:
        def kernel(a_ref, w_ref, o_ref, acc_ref):
            _kernel(a_ref, w_ref, None, None, o_ref, acc_ref,
                    nk=nk, relu=False, quantize=False,
                    out_dtype=out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
