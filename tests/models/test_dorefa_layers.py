"""Parity of the standalone quant_ultra layers vs the PyTorch reference:
linear_Q_fn (quant_ultra.py:210-222), batchNorm2d_Q_fn (:94-132) and
batchNorm1d_Q_fn (:135-207, incl. its unquantized-affine quirk)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.models import (
    DoReFaBatchNorm,
    DoReFaBatchNorm1d,
    DoReFaDense,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def quant_ultra():
    return load_reference_module(
        "4-bit quantization/quant_ultra.py", "ref_quant_ultra_layers"
    )


def _rand_bn_state(feat, seed=0):
    g = torch.Generator().manual_seed(seed)
    return {
        "weight": torch.randn(feat, generator=g) * 0.5 + 1.0,
        "bias": torch.randn(feat, generator=g) * 0.2,
        "mean": torch.randn(feat, generator=g) * 0.2,
        "var": torch.rand(feat, generator=g) + 0.5,
    }


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_dorefa_dense_matches_linear_q(quant_ultra, w_bit):
    torch.manual_seed(0)
    ref = quant_ultra.linear_Q_fn(w_bit)(12, 7, bias=True)
    x = torch.randn(5, 12)
    with torch.no_grad():
        want = ref(x).numpy()

    layer = DoReFaDense(features=7, w_bit=w_bit)
    params = {
        "kernel": jnp.array(ref.weight.detach().numpy().T),
        "bias": jnp.array(ref.bias.detach().numpy()),
    }
    got = layer.apply({"params": params}, jnp.array(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("w_bit", [2, 4])
def test_dorefa_batchnorm2d_matches_reference(quant_ultra, w_bit):
    feat = 6
    st = _rand_bn_state(feat)
    ref = quant_ultra.batchNorm2d_Q_fn(w_bit)(feat)
    with torch.no_grad():
        ref.weight.copy_(st["weight"])
        ref.bias.copy_(st["bias"])
        ref.running_mean.copy_(st["mean"])
        ref.running_var.copy_(st["var"])
    x = torch.randn(2, feat, 4, 4)
    with torch.no_grad():
        want = ref(x).numpy()  # NCHW

    layer = DoReFaBatchNorm(w_bit=w_bit)
    variables = {
        "params": {
            "scale": jnp.array(st["weight"].numpy()),
            "bias": jnp.array(st["bias"].numpy()),
        },
        "batch_stats": {
            "mean": jnp.array(st["mean"].numpy()),
            "var": jnp.array(st["var"].numpy()),
        },
    }
    x_nhwc = jnp.array(x.numpy().transpose(0, 2, 3, 1))
    got = layer.apply(variables, x_nhwc)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-6
    )


def _bn1d_variables(st):
    return {
        "params": {
            "scale": jnp.array(st["weight"].numpy()),
            "bias": jnp.array(st["bias"].numpy()),
        },
        "batch_stats": {
            "mean": jnp.array(st["mean"].numpy()),
            "var": jnp.array(st["var"].numpy()),
        },
    }


def test_dorefa_batchnorm1d_eval_matches_reference(quant_ultra):
    feat = 9
    st = _rand_bn_state(feat, seed=1)
    ref = quant_ultra.batchNorm1d_Q_fn(4)(feat)
    with torch.no_grad():
        ref.weight.copy_(st["weight"])
        ref.bias.copy_(st["bias"])
        ref.running_mean.copy_(st["mean"])
        ref.running_var.copy_(st["var"])
    ref.eval()
    x = torch.randn(8, feat)
    with torch.no_grad():
        want = ref(x).numpy()

    got = DoReFaBatchNorm1d(w_bit=4).apply(
        _bn1d_variables(st), jnp.array(x.numpy()), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_dorefa_batchnorm1d_train_matches_reference(quant_ultra):
    # The reference forward passes eps*0 to F.batch_norm, which modern torch
    # REJECTS in training mode ("eps must be positive"), so the reference
    # train path cannot run as-is; oracle = the same F.batch_norm call with
    # eps=1e-12 (numerically the eps->0 semantics the reference encodes).
    feat = 5
    st = _rand_bn_state(feat, seed=2)
    x = torch.randn(16, feat)
    with torch.no_grad():
        denom = torch.sqrt(st["var"]) + 1e-5
        w = st["weight"] / denom
        b = st["bias"] - (st["mean"] / denom) * st["weight"]
        want = torch.nn.functional.batch_norm(
            x, torch.zeros(feat), torch.ones(feat), w, b,
            training=True, momentum=0.1, eps=1e-12,
        ).numpy()

    got = DoReFaBatchNorm1d(w_bit=4).apply(
        _bn1d_variables(st), jnp.array(x.numpy()), train=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
