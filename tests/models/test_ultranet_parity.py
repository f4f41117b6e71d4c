"""UltraNet parity vs the reference torch model (BASELINE.json config 2).

Ports weights from the reference UltraNetQua (4-bit quantization/mymodel.py)
and asserts forward parity (train-mode raw predictions AND eval-mode YOLO
decode), then checks the integer folded-BN path against the float path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.models import UltraNet, UltraNetInt, ULTRANET_LAYERS
from quantized_vit_tpu.quant import (
    weight_quantize_int,
    bn_act_quantize_int,
    requantize_int,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_model():
    import sys, os
    # mymodel.py does `from quant_ultra import *`
    sys.path.insert(0, os.path.join("/root/reference", "4-bit quantization"))
    try:
        mod = load_reference_module("4-bit quantization/mymodel.py", "ref_mymodel")
    finally:
        sys.path.pop(0)
    # UltraNetQua() draws conv weights from torch's GLOBAL rng: seed it so
    # the weights don't depend on which tests ran earlier in the process
    # (an unlucky draw can land a weight on a fake-quant rounding knife
    # edge where torch and XLA f32 tanh/round disagree by one 4-bit level)
    torch.manual_seed(1234)
    m = mod.UltraNetQua()
    # randomize BN stats so folding is non-trivial
    g = torch.Generator().manual_seed(0)
    for mm in m.modules():
        if isinstance(mm, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mm.running_mean.copy_(torch.randn(mm.num_features, generator=g) * 0.2)
                mm.running_var.copy_(torch.rand(mm.num_features, generator=g) + 0.5)
                mm.weight.copy_(torch.randn(mm.num_features, generator=g) * 0.5 + 1.0)
                mm.bias.copy_(torch.randn(mm.num_features, generator=g) * 0.2)
    m.eval()
    return m


def port_ultranet_weights(params, batch_stats, ref):
    convs = [m for m in ref.modules() if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in ref.modules() if isinstance(m, torch.nn.BatchNorm2d)]
    assert len(convs) == 9 and len(bns) == 8
    for i, c in enumerate(convs):
        key = f"conv_{i}"
        params[key]["kernel"] = jnp.array(
            c.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        if c.bias is not None:
            params[key]["bias"] = jnp.array(c.bias.detach().numpy())
    for i, b in enumerate(bns):
        key = f"bn_{i}"
        params[key]["scale"] = jnp.array(b.weight.detach().numpy())
        params[key]["bias"] = jnp.array(b.bias.detach().numpy())
        batch_stats[key]["mean"] = jnp.array(b.running_mean.numpy())
        batch_stats[key]["var"] = jnp.array(b.running_var.numpy())
    return params, batch_stats


def test_ultranet_eval_matches_reference(ref_model):
    import flax

    model = UltraNet()
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 128, 3)).astype(np.float32)  # H, W div by 16
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    params, stats = port_ultranet_weights(params, stats, ref_model)

    with torch.no_grad():
        ref_io, ref_p = ref_model(torch.tensor(x.transpose(0, 3, 1, 2)))
    io, p = model.apply({"params": params, "batch_stats": stats}, jnp.array(x))

    # raw predictions [B, na, ny, nx, no]
    np.testing.assert_allclose(
        np.asarray(p), ref_p[0].numpy(), rtol=1e-3, atol=1e-4
    )
    # decoded boxes
    np.testing.assert_allclose(
        np.asarray(io), ref_io.numpy(), rtol=1e-3, atol=1e-3
    )


def test_ultranet_train_mode_matches_reference(ref_model):
    import flax

    model = UltraNet()
    rng = np.random.default_rng(1)
    x = rng.random((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    params, stats = port_ultranet_weights(params, stats, ref_model)

    # reference train mode still uses running stats only if .eval()... its
    # train path returns raw p; emulate: torch module in train() would update
    # BN stats, so compare against eval-mode BN + train-return instead:
    ref_model.eval()
    with torch.no_grad():
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        img_size = xt.shape[-2:]
        feats = ref_model.layers(xt)
        ref_p = ref_model.yololayer(feats, img_size)
        if isinstance(ref_p, tuple):
            ref_p = ref_p[1]

    p = model.apply(
        {"params": params, "batch_stats": stats}, jnp.array(x), train=False
    )[1]
    np.testing.assert_allclose(np.asarray(p), ref_p.numpy(), rtol=1e-3, atol=1e-4)


def test_ultranet_int_requant_matches_float_path_per_layer(ref_model):
    """Integer folded-BN requant vs float conv+BN+act-quant with the SAME
    layer inputs: fresh mismatch must be <1.5% of positions and at most 1
    level (the intrinsic double-rounding of the inc/bias scheme,
    quantization.py:68-89). End-to-end divergence amplifies through layers
    for wild random BN params — the reference's FPGA path shares that
    property, so exactness is only defined per layer."""
    import flax
    from quantized_vit_tpu.quant import quantize_weight, quantize_activation

    convs = [c for c in ref_model.modules() if isinstance(c, torch.nn.Conv2d)]
    bns = [b for b in ref_model.modules() if isinstance(b, torch.nn.BatchNorm2d)]
    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(2)
    xf = jnp.array(rng.random((1, 32, 64, 3)).astype(np.float32))

    for i, (feat, ks, pool) in enumerate(ULTRANET_LAYERS):
        in_bit = 8 if i == 0 else 4
        k = jnp.array(convs[i].weight.detach().numpy().transpose(2, 3, 1, 0))
        gamma = jnp.array(bns[i].weight.detach().numpy())
        beta = jnp.array(bns[i].bias.detach().numpy())
        mean = jnp.array(bns[i].running_mean.numpy())
        var = jnp.array(bns[i].running_var.numpy())

        # float path
        kq = quantize_weight(k, 4)
        yf = jax.lax.conv_general_dilated(xf, kq, (1, 1), "SAME",
                                          dimension_numbers=dn)
        bnf = (yf - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
        af = quantize_activation(bnf, 4)
        f_lv = jnp.round(af * 15).astype(jnp.int32)

        # integer path on the SAME input (quantized to in_bit levels)
        x_lv = jnp.round(jnp.clip(xf, 0, 1) * (2**in_bit - 1)).astype(jnp.int32)
        ki = weight_quantize_int(k, bit=4)
        acc = jax.lax.conv_general_dilated(
            x_lv, ki, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        inc, bias = bn_act_quantize_int(
            gamma, beta, mean, var, 1e-5,
            w_bit=4, in_bit=in_bit, out_bit=4, l_shift=8)
        i_lv = requantize_int(acc, inc, bias, w_bit=4, in_bit=in_bit,
                              out_bit=4, l_shift=8)

        d = np.abs(np.asarray(f_lv) - np.asarray(i_lv))
        assert d.max() <= 1, (i, d.max())
        assert (d > 0).mean() < 0.015, (i, (d > 0).mean())

        xf = af
        if pool:
            xf = jax.lax.reduce_window(xf, -jnp.inf, jax.lax.max,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def test_ultranet_int_model_runs_end_to_end(ref_model):
    """UltraNetInt consumes exported integer params and produces finite,
    correlated YOLO outputs (smoke-level end-to-end for the artifact path)."""
    import flax

    model = UltraNet()
    rng = np.random.default_rng(2)
    x = rng.random((1, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    params, stats = port_ultranet_weights(params, stats, ref_model)

    io_f, p_f = model.apply({"params": params, "batch_stats": stats}, jnp.array(x))

    int_params = {}
    for i in range(len(ULTRANET_LAYERS)):
        k = params[f"conv_{i}"]["kernel"]
        int_params[f"conv_{i}_kernel_int"] = weight_quantize_int(k, bit=4)
        inc, bias = bn_act_quantize_int(
            params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"],
            stats[f"bn_{i}"]["mean"], stats[f"bn_{i}"]["var"], 1e-5,
            w_bit=4, in_bit=(8 if i == 0 else 4), out_bit=4, l_shift=8,
        )
        int_params[f"conv_{i}_inc"] = inc
        int_params[f"conv_{i}_bias_int"] = bias
    int_params["conv_8_kernel_int"] = weight_quantize_int(
        params["conv_8"]["kernel"], bit=4)
    int_params["conv_8_bias"] = params["conv_8"]["bias"]

    x_levels = jnp.round(jnp.clip(jnp.array(x), 0, 1) * 255).astype(jnp.int32)
    io_i, p_i = UltraNetInt().apply({"params": int_params}, x_levels)

    assert np.all(np.isfinite(np.asarray(io_i)))
    corr = np.corrcoef(np.asarray(p_f).ravel(), np.asarray(p_i).ravel())[0, 1]
    assert corr > 0.85, corr
