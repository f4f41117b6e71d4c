"""Parity tests: LSFQ quantizers vs the reference torch autograd Functions.

Covers BASELINE.json config 1 (single quantized layer fwd on CPU vs PyTorch
parity) at the quantizer level: forward values AND all four gradients
(x, d, q_m, t) must match the reference's hand-derived backward
(quant_layers.py:33-205), including the mask-precedence corner cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.quant import lsfq_nonlinear, lsfq_linear, dge
from quantized_vit_tpu.quant.lsfq import lsfq_levels, lsfq_dequant

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_quant():
    # float64 default so the reference backward's internal
    # torch.tensor([float("nan")]) literal (quant_layers.py:108-110) matches
    # the double inputs we feed it.
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield load_reference_module(
        "QViT_with_GETA/only_train_once/quantization/quant_layers.py",
        "ref_quant_layers",
    )
    torch.set_default_dtype(prev)


def _rand(shape, seed, scale=1.0, offset=0.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale + offset).astype(np.float64)


CASES = [
    # (d, q_m, t, scale) — normal, tight-range, q_m<=q_s corner, t!=1
    (0.05, 1.0, 1.0, 0.7),
    (0.13, 0.5, 1.3, 1.0),
    (0.02, 2.0, 0.8, 1.5),
    (0.1, 0.0, 1.0, 1.0),  # q_m == q_s == 0 corner (reachable in training)
]


@pytest.mark.parametrize("d,q_m,t,scale", CASES)
def test_nonlinear_forward_and_grads_match_reference(ref_quant, d, q_m, t, scale):
    x_np = _rand((64, 32), seed=0, scale=scale)
    g_np = _rand((64, 32), seed=1)
    clip = (-2.0, 2.0)
    q_s = 0.0

    # reference
    xt = torch.tensor(x_np, dtype=torch.float64, requires_grad=True)
    dt = torch.tensor([d], dtype=torch.float64, requires_grad=True)
    qt = torch.tensor([q_m], dtype=torch.float64, requires_grad=True)
    tt = torch.tensor([t], dtype=torch.float64, requires_grad=True)
    yt = ref_quant.SymQuantizerNonLinear.apply(
        xt, dt, qt, tt, torch.tensor(clip, dtype=torch.float64), torch.tensor(q_s, dtype=torch.float64)
    )
    yt.backward(torch.tensor(g_np, dtype=torch.float64))

    # ours
    f = lambda x, dd, qq, ttt: lsfq_nonlinear(
        x, dd, qq, ttt, jnp.array(clip), jnp.array(q_s)
    )
    y, vjp = jax.vjp(
        f, jnp.array(x_np), jnp.array([d]), jnp.array([q_m]), jnp.array([t])
    )
    gx, gd, gqm, gt = vjp(jnp.array(g_np))

    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gd), dt.grad.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gqm), qt.grad.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("d,q_m,scale", [(0.05, 1.0, 0.7), (0.13, 0.5, 1.2)])
def test_linear_forward_and_grads_match_reference(ref_quant, d, q_m, scale):
    x_np = _rand((48, 16), seed=2, scale=scale)
    g_np = _rand((48, 16), seed=3)
    clip = (-2.0, 2.0)

    xt = torch.tensor(x_np, dtype=torch.float64, requires_grad=True)
    dt = torch.tensor([d], dtype=torch.float64, requires_grad=True)
    qt = torch.tensor([q_m], dtype=torch.float64, requires_grad=True)
    yt = ref_quant.SymQuantizerLinear.apply(
        xt, dt, qt, torch.tensor(clip, dtype=torch.float64), torch.tensor(0.0, dtype=torch.float64)
    )
    yt.backward(torch.tensor(g_np, dtype=torch.float64))

    f = lambda x, dd, qq: lsfq_linear(x, dd, qq, jnp.array(clip), jnp.array(0.0))
    y, vjp = jax.vjp(f, jnp.array(x_np), jnp.array([d]), jnp.array([q_m]))
    gx, gd, gqm = vjp(jnp.array(g_np))

    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gd), dt.grad.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gqm), qt.grad.numpy(), rtol=1e-9, atol=1e-9)


def test_dge_forward_and_input_grad_match_reference(ref_quant):
    d, q_m, bits = 0.1, 1.0, 4.0
    x_np = _rand((32, 8), seed=4, scale=0.6)
    g_np = _rand((32, 8), seed=5)
    clip = (-2.0, 2.0)

    xt = torch.tensor(x_np, dtype=torch.float64, requires_grad=True)
    dt = torch.tensor([d], dtype=torch.float64, requires_grad=True)
    qt = torch.tensor([q_m], dtype=torch.float64, requires_grad=True)
    yt = ref_quant.DGEQuantizer.apply(
        xt, dt, qt, torch.tensor(clip, dtype=torch.float64), torch.tensor(0.0, dtype=torch.float64), torch.tensor(bits, dtype=torch.float64)
    )
    yt.backward(torch.tensor(g_np, dtype=torch.float64))

    f = lambda x, dd, qq: dge(
        x, dd, qq, jnp.array(clip), jnp.array(0.0), jnp.array(bits)
    )
    y, vjp = jax.vjp(f, jnp.array(x_np), jnp.array([d]), jnp.array([q_m]))
    gx, gd, gqm = vjp(jnp.array(g_np))

    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gd), dt.grad.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gqm), qt.grad.numpy(), rtol=1e-9, atol=1e-9)


def test_levels_roundtrip_matches_float_forward():
    """d * lsfq_levels == lsfq_nonlinear forward, for t != 1 too (the property
    the INT kernels rely on)."""
    d, q_m, t = 0.07, 1.1, 1.25
    x = jnp.array(_rand((128, 64), seed=6, scale=0.8))
    y_float = lsfq_nonlinear(
        x, jnp.array([d]), jnp.array([q_m]), jnp.array([t]),
        jnp.array([-2.0, 2.0]), jnp.array(0.0),
    )
    lv = lsfq_levels(x, jnp.array([d]), jnp.array([q_m]), jnp.array([t]))
    y_int = lsfq_dequant(lv, jnp.array([d]))
    np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_float), rtol=1e-9, atol=1e-10)


def test_nonlinear_is_jittable_and_grad_under_jit():
    d, q_m, t = 0.05, 1.0, 1.1
    x = jnp.array(_rand((16, 16), seed=7))

    @jax.jit
    def loss(x, d, q_m, t):
        y = lsfq_nonlinear(
            x, d, q_m, t, jnp.array([-2.0, 2.0]), jnp.array(0.0)
        )
        return jnp.sum(y**2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        x, jnp.array([d]), jnp.array([q_m]), jnp.array([t])
    )
    assert all(np.all(np.isfinite(np.asarray(gi))) for gi in g)
