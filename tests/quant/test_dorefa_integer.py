"""Parity tests: DoReFa/UltraNet quantizers and integer export math vs reference.

Oracles: `4-bit quantization/quant_ultra.py` (training-side torch) and
`4-bit quantization/quantization.py` (export-side numpy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.quant import (
    uniform_quantize,
    quantize_weight,
    quantize_activation,
    quantize_weight_levels,
    quantize_activation_levels,
    fold_batchnorm,
    weight_quantize_int,
    bn_act_w_bias_float,
    bn_act_quantize_int,
    requantize_int,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_ultra():
    return load_reference_module("4-bit quantization/quant_ultra.py", "ref_quant_ultra")


@pytest.fixture(scope="module")
def ref_int():
    return load_reference_module("4-bit quantization/quantization.py", "ref_quantization")


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 8])
def test_uniform_quantize_matches(ref_ultra, k):
    x = _rand((32, 16), seed=0)
    ref = ref_ultra.uniform_quantize(k)(torch.tensor(x)).numpy()
    got = np.asarray(uniform_quantize(jnp.array(x), k))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


# w_bit=1 excluded: the reference's own 1-bit path is broken (it constructs
# uniform_quantize(k=w_bit-1=0) whose forward divides by 2^0-1 = 0 -> NaN,
# quant_ultra.py:36,46). Ours implements the intended DoReFa sign binarization.
@pytest.mark.parametrize("w_bit", [2, 4, 8, 32])
def test_weight_quantize_matches(ref_ultra, w_bit):
    x = _rand((64, 3, 3, 3), seed=1)
    ref = ref_ultra.weight_quantize_fn(w_bit)(torch.tensor(x)).detach().numpy()
    got = np.asarray(quantize_weight(jnp.array(x), w_bit))
    if w_bit == 32:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    else:
        # torch and XLA tanh differ by ~1 ulp; values on a rounding knife-edge
        # may flip one level. Require <=1 level difference, <0.1% of elements.
        step = 1.0 / (2 ** (w_bit - 1) - 1)
        diff = np.abs(got - ref)
        assert diff.max() <= step * 1.0001
        assert (diff > step * 1e-3).mean() < 1e-3


@pytest.mark.parametrize("a_bit", [2, 4, 8, 32])
def test_activation_quantize_matches(ref_ultra, a_bit):
    x = _rand((8, 16, 10, 10), seed=2)
    ref = ref_ultra.activation_quantize_fn(a_bit)(torch.tensor(x)).detach().numpy()
    got = np.asarray(quantize_activation(jnp.array(x), a_bit))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_weight_levels_consistent_with_float():
    w_bit = 4
    x = jnp.array(_rand((16, 8), seed=3))
    lv = quantize_weight_levels(x, w_bit)
    n = 2 ** (w_bit - 1) - 1
    np.testing.assert_allclose(
        np.asarray(lv) / n, np.asarray(quantize_weight(x, w_bit)), rtol=1e-5, atol=1e-6
    )
    assert np.abs(np.asarray(lv)).max() <= n


def test_activation_levels_consistent_with_float():
    a_bit = 4
    x = jnp.array(_rand((16, 8), seed=4))
    lv = quantize_activation_levels(x, a_bit)
    n = 2**a_bit - 1
    np.testing.assert_allclose(
        np.asarray(lv) / n, np.asarray(quantize_activation(x, a_bit)), rtol=1e-5, atol=1e-6
    )
    assert np.asarray(lv).min() >= 0 and np.asarray(lv).max() <= n


def test_ste_gradient_is_straight_through():
    x = jnp.array(_rand((8, 8), seed=5, scale=0.3))
    g = jax.grad(lambda v: jnp.sum(uniform_quantize(v, 4)))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)))


def test_quantized_bn_fold_matches_reference_layer(ref_ultra):
    """fold_batchnorm(γ,β,μ,σ²,ε) reproduces BatchNorm2d_Q.forward in eval."""
    c = 16
    rng = np.random.default_rng(6)
    bn = ref_ultra.batchNorm2d_Q_fn(4)(c)
    bn.eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.standard_normal(c).astype(np.float32)))
        bn.bias.copy_(torch.tensor(rng.standard_normal(c).astype(np.float32)))
        bn.running_mean.copy_(torch.tensor(rng.standard_normal(c).astype(np.float32)))
        bn.running_var.copy_(
            torch.tensor((rng.random(c).astype(np.float32) + 0.1))
        )
    x = _rand((2, c, 5, 5), seed=7)
    ref = bn(torch.tensor(x)).detach().numpy()

    w_q, b_q = fold_batchnorm(
        jnp.array(bn.weight.detach().numpy()),
        jnp.array(bn.bias.detach().numpy()),
        jnp.array(bn.running_mean.numpy()),
        jnp.array(bn.running_var.numpy()),
        bn.eps,
        w_bit=4,
    )
    got = np.asarray(
        jnp.array(x) * np.asarray(w_q)[None, :, None, None]
        + np.asarray(b_q)[None, :, None, None]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_weight_quantize_int_matches(ref_int):
    x = _rand((4, 16, 3, 3), seed=8)
    ref = ref_int.weight_quantize_int(x, bit=4)
    got = np.asarray(weight_quantize_int(jnp.array(x), bit=4))
    np.testing.assert_array_equal(got, ref)


def test_bn_act_quantize_int_matches(ref_int):
    rng = np.random.default_rng(9)
    c = 32
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = (rng.random(c) + 0.1).astype(np.float32)
    eps = 1e-5

    ref_w, ref_b = ref_int.bn_act_w_bias_float(gamma, beta, mean, var, eps)
    got_w, got_b = bn_act_w_bias_float(
        jnp.array(gamma), jnp.array(beta), jnp.array(mean), jnp.array(var), eps
    )
    np.testing.assert_allclose(np.asarray(got_w), ref_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), ref_b, rtol=1e-5, atol=1e-6)

    ref_inc, ref_bias = ref_int.bn_act_quantize_int(
        gamma, beta, mean, var, eps, w_bit=4, in_bit=4, out_bit=4, l_shift=8
    )
    got_inc, got_bias = bn_act_quantize_int(
        jnp.array(gamma), jnp.array(beta), jnp.array(mean), jnp.array(var), eps,
        w_bit=4, in_bit=4, out_bit=4, l_shift=8,
    )
    np.testing.assert_array_equal(np.asarray(got_inc), ref_inc)
    np.testing.assert_array_equal(np.asarray(got_bias), ref_bias)


def test_requantize_int_approximates_float_bn_act_path():
    """Integer requant ≈ float path: round(clip(bn(acc*s_w*s_in),0,1)*(2^o-1)).

    l_shift=8 gives ~8 extra bits of precision; allow off-by-one from the
    double rounding of inc/bias.
    """
    rng = np.random.default_rng(10)
    c, n = 8, 64
    w_bit = in_bit = out_bit = 4
    l_shift = 8
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = (rng.random(c) + 0.5).astype(np.float32)
    eps = 1e-5

    acc = rng.integers(-3000, 3000, size=(n, c)).astype(np.int32)
    s_w = 1.0 / (2 ** (w_bit - 1) - 1)
    s_in = 1.0 / (2**in_bit - 1)

    w, b = bn_act_w_bias_float(
        jnp.array(gamma), jnp.array(beta), jnp.array(mean), jnp.array(var), eps
    )
    float_out = np.asarray(acc) * s_w * s_in * np.asarray(w)[None, :] + np.asarray(b)[None, :]
    float_lv = np.round(np.clip(float_out, 0, 1) * (2**out_bit - 1))

    inc, bias = bn_act_quantize_int(
        jnp.array(gamma), jnp.array(beta), jnp.array(mean), jnp.array(var), eps,
        w_bit=w_bit, in_bit=in_bit, out_bit=out_bit, l_shift=l_shift,
    )
    # requantize (without the clip-to-[0,1] the float path applies before
    # scaling, integer path clips after)
    int_lv = np.asarray(
        requantize_int(
            jnp.array(acc), inc[None, :], bias[None, :],
            w_bit=w_bit, in_bit=in_bit, out_bit=out_bit, l_shift=l_shift,
        )
    )
    # off-by-one tolerance at level boundaries
    assert np.abs(int_lv - float_lv).max() <= 1
    assert (np.abs(int_lv - float_lv) > 0).mean() < 0.05
