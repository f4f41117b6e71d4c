"""Tests for INT4 packing round-trip and bit-width algebra."""

import numpy as np
import pytest

import jax.numpy as jnp

from quantized_vit_tpu.quant import (
    pack_int4,
    unpack_int4,
    bit_width,
    d_for_bits,
    init_quant_params,
    clip_transform,
    quant_residual,
    quantize_simple,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
    packed = pack_int4(jnp.array(w), axis=0)
    assert packed.shape == (32, 32)
    assert packed.dtype == jnp.int8
    out = unpack_int4(packed, axis=0)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_pack_unpack_other_axis():
    rng = np.random.default_rng(1)
    w = rng.integers(-8, 8, size=(16, 48)).astype(np.int8)
    packed = pack_int4(jnp.array(w), axis=1)
    assert packed.shape == (16, 24)
    out = unpack_int4(packed, axis=1)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_pack_odd_axis_raises():
    with pytest.raises(ValueError):
        pack_int4(jnp.zeros((7, 4), jnp.int8), axis=0)


def test_bitwidth_d_roundtrip():
    """d_for_bits and bit_width are inverse for integer bit targets."""
    for bits in [4.0, 6.0, 8.0, 16.0]:
        for q_m in [0.5, 1.0, 2.7]:
            for t in [1.0, 1.2]:
                d = d_for_bits(jnp.array(bits), jnp.array(q_m), jnp.array(t))
                b = bit_width(d, jnp.array(q_m), jnp.array(t))
                assert abs(float(b) - bits) < 1e-4, (bits, q_m, t, float(b))


def test_init_quant_params_matches_reference_formula():
    """quant_layers.py:413-440: q_m=max|W|, d=(q_m-0)/(2^(b-1)-1)."""
    rng = np.random.default_rng(2)
    w = jnp.array(rng.standard_normal((32, 16)).astype(np.float32))
    d, q_m, t = init_quant_params(w, num_bits=32, nonlinear=True)
    assert float(q_m[0]) == pytest.approx(float(jnp.max(jnp.abs(w))))
    assert float(d[0]) == pytest.approx(float(q_m[0]) / (2**31 - 1))
    assert float(t[0]) == 1.0
    # resulting bit width is the init bit width
    assert float(bit_width(d, q_m, t)[0]) == pytest.approx(32.0, abs=1e-3)


def test_residual_is_quantize_minus_clip_over_d():
    """residual == (quantize - d*clip/d)/... : Q(x) = d*(clip(x)/d + r(x))."""
    rng = np.random.default_rng(3)
    x = jnp.array(rng.standard_normal((32, 8)).astype(np.float32) * 0.5)
    d, q_m, t = jnp.array(0.05), jnp.array(1.0), jnp.array(1.2)
    q = quantize_simple(x, d, q_m, t)
    c = clip_transform(x, q_m, t)
    r = quant_residual(x, d, q_m, t)
    np.testing.assert_allclose(np.asarray(q), np.asarray(d * (c / d + r)), rtol=1e-4, atol=1e-5)
