"""Pallas INT4/INT8 matmul kernels vs XLA integer oracle (exact equality).

Runs in interpret mode on CPU; the same kernels compile for real TPU in
bench.py and __graft_entry__.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quantized_vit_tpu.ops import (
    int4_matmul,
    int8_matmul,
    int4_matmul_ref,
    int8_matmul_ref,
)
from quantized_vit_tpu.quant import pack_int4


def _levels(shape, seed, lo=-7, hi=8):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape).astype(np.int8)


@pytest.mark.parametrize(
    "m,k,n",
    [
        (8, 64, 128),       # tiny
        (197, 768, 768),    # ViT-B proj shape (unaligned M)
        (100, 250, 130),    # fully unaligned everything
    ],
)
def test_int4_matmul_matches_reference_exactly(m, k, n):
    k_even = k + (k % 2)
    x = _levels((m, k_even), seed=0)
    w = _levels((k_even, n), seed=1)
    w_packed = pack_int4(jnp.array(w), axis=0)
    rng = np.random.default_rng(2)
    scale = rng.random(n).astype(np.float32) * 0.01
    bias = rng.standard_normal(n).astype(np.float32)

    acc_ref = np.asarray(int4_matmul_ref(jnp.array(x), w_packed))
    expect = acc_ref.astype(np.float32) * scale[None, :] + bias[None, :]

    got = np.asarray(
        int4_matmul(
            jnp.array(x), w_packed, jnp.array(scale), jnp.array(bias),
            block_m=64, block_n=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-5)


def test_int4_matmul_scalar_scale_no_bias():
    x = _levels((32, 128), seed=3)
    w = _levels((128, 64), seed=4)
    w_packed = pack_int4(jnp.array(w), axis=0)
    acc = np.asarray(int4_matmul_ref(jnp.array(x), w_packed))
    got = np.asarray(
        int4_matmul(jnp.array(x), w_packed, jnp.float32(0.02), interpret=True,
                    block_m=32, block_n=64)
    )
    np.testing.assert_allclose(got, acc * 0.02, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("m,k,n", [(64, 128, 128), (197, 768, 256)])
def test_int8_matmul_matches_reference_exactly(m, k, n):
    x = _levels((m, k), seed=5, lo=-127, hi=128)
    w = _levels((k, n), seed=6, lo=-127, hi=128)
    rng = np.random.default_rng(7)
    scale = rng.random(n).astype(np.float32) * 0.001
    acc = np.asarray(int8_matmul_ref(jnp.array(x), jnp.array(w)))
    got = np.asarray(
        int8_matmul(jnp.array(x), jnp.array(w), jnp.array(scale),
                    interpret=True, block_m=64, block_n=128)
    )
    np.testing.assert_allclose(got, acc.astype(np.float32) * scale[None, :],
                               rtol=1e-6, atol=1e-5)


def test_int4_matmul_rejects_bad_dtypes_and_shapes():
    with pytest.raises(TypeError):
        int4_matmul(jnp.zeros((4, 8), jnp.float32), jnp.zeros((4, 8), jnp.int8), 1.0)
    with pytest.raises(ValueError):
        int4_matmul(jnp.zeros((4, 8), jnp.int8), jnp.zeros((3, 8), jnp.int8), 1.0)


def test_full_lsfq_pipeline_through_kernel():
    """Float fake-quant linear == int kernel on levels (the parity the ViT
    W4A4 path relies on): quantize weight+act with LSFQ, run float matmul vs
    int4 kernel with scale d_w*d_a."""
    import jax
    from quantized_vit_tpu.quant import lsfq_nonlinear, init_quant_params
    from quantized_vit_tpu.quant.lsfq import lsfq_levels

    rng = np.random.default_rng(8)
    x = jnp.array(rng.standard_normal((64, 256)).astype(np.float32) * 0.5)
    w = jnp.array(rng.standard_normal((256, 128)).astype(np.float32) * 0.05)
    d_w, qm_w, t_w = init_quant_params(w, num_bits=4, nonlinear=True)
    d_a, qm_a, t_a = init_quant_params(x, num_bits=4, nonlinear=True)
    clip = jnp.array([-2.0, 2.0])
    q_s = jnp.array(0.0)

    w_q = lsfq_nonlinear(w, d_w, qm_w, t_w, clip, q_s)
    x_q = lsfq_nonlinear(x, d_a, qm_a, t_a, clip, q_s)
    float_out = x_q @ w_q  # the reference's F.linear on fake-quant values

    w_lv = lsfq_levels(w, d_w, qm_w, t_w).astype(jnp.int8)
    x_lv = lsfq_levels(x, d_a, qm_a, t_a).astype(jnp.int8)
    w_packed = pack_int4(w_lv, axis=0)
    scale = (d_w * d_a)[0]
    int_out = int4_matmul(x_lv, w_packed, scale, interpret=True,
                          block_m=64, block_n=128)

    np.testing.assert_allclose(
        np.asarray(int_out), np.asarray(float_out), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("fmt", ["int4", "int8"])
@pytest.mark.parametrize("act_pow", [True, False])
def test_quant_matmul_fa_matches_unfused(fmt, act_pow):
    """Fused activation-quant matmul == quantize-then-matmul (levels path)."""
    from quantized_vit_tpu.ops import quant_matmul_fa, int8_matmul_ref

    rng = np.random.default_rng(11)
    m, k, n = 24, 64, 48
    x = jnp.array(rng.standard_normal((m, k)).astype(np.float32))
    w_lv = _levels((k, n), seed=12, lo=-7, hi=8)
    d = jnp.float32(0.02)
    t = jnp.float32(1.3 if act_pow else 1.0)
    top = jnp.float32(127.0)
    scale = jnp.array(rng.random(n).astype(np.float32) * 0.01)
    bias = jnp.array(rng.standard_normal(n).astype(np.float32))

    p = np.abs(np.asarray(x)) ** float(t) if act_pow else np.abs(np.asarray(x))
    x_lv = (np.sign(np.asarray(x))
            * np.minimum(np.round(p / float(d)), float(top))).astype(np.int8)
    acc = np.asarray(int8_matmul_ref(jnp.array(x_lv), jnp.array(w_lv)))
    want = acc.astype(np.float32) * np.asarray(scale)[None, :] + np.asarray(bias)

    w = pack_int4(jnp.array(w_lv), axis=0) if fmt == "int4" else jnp.array(w_lv)
    got = np.asarray(quant_matmul_fa(
        x, w, scale, bias, d, t, top, fmt=fmt, act_pow=act_pow,
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
