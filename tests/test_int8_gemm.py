"""Interpret-mode correctness of the Pallas int8 GEMM (ops/int8_gemm.py):
exact int32 accumulation vs numpy, the fused dequant epilogue, and the
folded requantize-to-int8 path (the form quant.py's 1x1 convs use)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from roadsurf_tpu.ops.int8_gemm import int8_gemm  # noqa: E402


def _ref(a, w):
    return np.asarray(a, np.int32) @ np.asarray(w, np.int32)


@pytest.mark.parametrize("M,K,N,bm,bn,bk", [
    (64, 128, 128, 32, 128, 64),     # multi-step K accumulation
    (96, 192, 160, 512, 256, 512),   # non-pow2 dims, clamped tiles
    (256, 256, 64, 128, 64, 128),    # multi-block M grid
])
def test_raw_int32_exact(M, K, N, bm, bn, bk):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (M, K), np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (K, N), np.int8))
    got = int8_gemm(a, w, bm=bm, bn=bn, bk=bk, interpret=True)
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), _ref(a, w))


def test_epilogue_bf16():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-127, 128, (64, 128), np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (128, 128), np.int8))
    mult = jnp.asarray(rng.uniform(0.001, 0.01, 128), jnp.float32)
    bias = jnp.asarray(rng.normal(size=128), jnp.float32)
    got = int8_gemm(a, w, mult, bias, relu=True,
                    bm=32, bn=128, bk=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = np.maximum(_ref(a, w) * np.asarray(mult) + np.asarray(bias), 0)
    err = np.abs(np.asarray(got, np.float32) - ref)
    # bf16 output rounding only: 2^-8 relative
    assert np.max(err / (np.abs(ref) + 1e-3)) < 2 ** -7


def test_requantize_folded_exact():
    """quant.py's streaming form: round((acc*mult + bias)/sa_out) expressed
    by folding 1/sa_out into mult/bias (relu commutes with the positive
    scaling)."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.integers(-127, 128, (96, 192), np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (192, 160), np.int8))
    mult = np.asarray(rng.uniform(0.001, 0.01, 160), np.float32)
    bias = np.asarray(rng.normal(size=160), np.float32)
    sa = 0.07
    got = int8_gemm(a, w, jnp.asarray(mult / sa), jnp.asarray(bias / sa),
                    relu=True, quantize=True, interpret=True)
    assert got.dtype == jnp.int8
    y = np.maximum(_ref(a, w) * mult + bias, 0.0) / sa
    ref = np.clip(np.round(y), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(got), ref)
