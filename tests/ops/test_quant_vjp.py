"""Fused quantizer-backward kernel vs the jnp VJP chain.

The kernel (ops/quant_vjp.py) computes grad_x + the (d, q_m, t)
reductions in one pass; it must match quant/lsfq.py:_nonlinear_bwd
(itself parity-pinned to the reference quant_layers.py:71-125) —
grad_x exactly, the reductions to f32 reduction-order tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops.quant_vjp import (lsfq_nonlinear_bwd_fused,
                                             quant_bwd_fits)
from quantized_vit_tpu.quant import lsfq_nonlinear
from quantized_vit_tpu.quant.lsfq import lsfq_nonlinear_fused

CLIP = (-2.0, 2.0)


def _jnp_grads(x, d, qm, t):
    clip = jnp.asarray(CLIP, jnp.float32)

    def loss(x, d, qm, t):
        return jnp.sum(lsfq_nonlinear(x, d, qm, t, clip, 0.0))

    # cotangent pattern g != 1 so reduction weighting is exercised
    g = jnp.cos(x * 3.0)
    y, vjp = jax.vjp(lambda *a: lsfq_nonlinear(*a, clip, 0.0), x, d, qm, t)
    return vjp(g), g


@pytest.mark.parametrize("shape", [(160, 256), (320, 128), (7, 4, 384)])
def test_fused_bwd_matches_jnp_chain(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 1.2)
    d = jnp.float32(0.07)
    qm = jnp.float32(1.1)
    t = jnp.float32(1.06)
    (gx_ref, gd_ref, gqm_ref, gt_ref), g = _jnp_grads(x, d, qm, t)
    gx, gd, gqm, gt = lsfq_nonlinear_bwd_fused(
        x, g, d, qm, t, clip_lo=CLIP[0], clip_hi=CLIP[1], q_s=0.0,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(gx_ref))
    for got, want in ((gd, gd_ref), (gqm, gqm_ref), (gt, gt_ref)):
        np.testing.assert_allclose(float(got), float(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_bwd_edge_masks():
    """Values pinned exactly at q_s, q_m, and the clip bounds take the
    same mask branches as the jnp chain."""
    d = jnp.float32(0.05)
    qm = jnp.float32(1.0)
    t = jnp.float32(1.0)
    base = np.array([0.0, 1e-8, 0.5, 1.0, 1.5, 2.0, 2.5,
                     -0.5, -1.0, -2.0, -3.0, 0.99, 1.01, -1e-8,
                     0.0, 0.0], np.float32)
    x = jnp.asarray(np.tile(base, (8, 8)))  # [8, 128]
    (gx_ref, gd_ref, gqm_ref, gt_ref), g = _jnp_grads(x, d, qm, t)
    gx, gd, gqm, gt = lsfq_nonlinear_bwd_fused(
        x, g, d, qm, t, clip_lo=CLIP[0], clip_hi=CLIP[1], q_s=0.0,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(gx_ref))
    for got, want in ((gd, gd_ref), (gqm, gqm_ref), (gt, gt_ref)):
        np.testing.assert_allclose(float(got), float(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_bwd_rejects_unaligned():
    assert not quant_bwd_fits(96)
    with pytest.raises(ValueError, match="128"):
        lsfq_nonlinear_bwd_fused(
            jnp.zeros((8, 96)), jnp.zeros((8, 96)), jnp.float32(0.1),
            jnp.float32(1.0), jnp.float32(1.0),
            clip_lo=-2.0, clip_hi=2.0, interpret=True)


def test_fused_custom_vjp_wrapper_cpu_fallback():
    """lsfq_nonlinear_fused: identical forward, and on CPU the backward
    falls back to the jnp chain — grads bitwise equal to lsfq_nonlinear."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((40, 96)).astype(np.float32))
    d = jnp.float32(0.04)
    qm = jnp.float32(0.9)
    t = jnp.float32(0.97)
    clip = jnp.asarray(CLIP, jnp.float32)
    y_ref = lsfq_nonlinear(x, d, qm, t, clip, 0.0)
    y = lsfq_nonlinear_fused(x, d, qm, t, CLIP[0], CLIP[1], 0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    g_ref = jax.grad(lambda *a: jnp.sum(
        lsfq_nonlinear(*a, clip, 0.0) ** 2), argnums=(0, 1, 2, 3))(
            x, d, qm, t)
    g = jax.grad(lambda *a: jnp.sum(
        lsfq_nonlinear_fused(*a, CLIP[0], CLIP[1], 0.0) ** 2),
        argnums=(0, 1, 2, 3))(x, d, qm, t)
    for a, b in zip(g, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
