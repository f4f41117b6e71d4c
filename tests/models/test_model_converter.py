"""model_to_quantize_model converter (quant_model.py:15-82 +
initialize_quant_layer, quant_layers.py:413-440): every Dense/Conv gains
(d, q_m, t) scalars initialized from the weights, and at high initial bit
width the quantized model ~= the float model (the reference's
test_quant_model.py:31-110 idiom)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.models import (
    QuantConfig,
    ViTConfig,
    VisionTransformer,
    collect_quant_params,
    mobilenet_small,
    model_to_quantize_model,
    resnet8,
)


def _init(model, shape=(2, 32, 32, 3), seed=0):
    x = jnp.array(np.random.default_rng(seed).standard_normal(shape),
                  jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(v["params"])
    stats = (flax.core.unfreeze(v["batch_stats"])
             if "batch_stats" in v else None)
    return params, stats, x


def test_converted_resnet_matches_fp32_at_high_bits():
    m = resnet8()
    params, stats, x = _init(m)
    y_f = np.asarray(m.apply({"params": params, "batch_stats": stats}, x,
                             deterministic=True))
    qm, qp = model_to_quantize_model(
        m, params, x, quant=QuantConfig(enabled=True, quantize_acts=False),
        init_bits=16.0)
    y_q = np.asarray(qm.apply({"params": qp, "batch_stats": stats}, x,
                              deterministic=True))
    np.testing.assert_allclose(y_q, y_f, rtol=1e-2, atol=1e-3)


def test_converted_vit_structure_and_parity():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=48, depth=2,
                    num_heads=2, num_classes=5, quant=QuantConfig.off())
    m = VisionTransformer(cfg)
    params, _, x = _init(m)
    y_f = np.asarray(m.apply({"params": params}, x))
    qm, qp = model_to_quantize_model(m, params, x, init_bits=24.0)
    # 200-learnable-quant-param bookkeeping (train.py:320-322): with W&A
    # mode and the nonlinear quantizer each layer carries 6 scalars; ViT has
    # patch_embed + head + 4 per block quantized layers
    layers = collect_quant_params(qp)
    assert len(layers) == 2 + 4 * cfg.depth
    assert all(len(v) == 6 for v in layers.values())
    # q_m initialized to max|W|
    k = qp["blocks_0"]["mlp"]["fc1"]
    np.testing.assert_allclose(np.asarray(k["q_m_wt"])[0],
                               float(jnp.max(jnp.abs(k["kernel"]))),
                               rtol=1e-6)
    # parity idiom needs WEIGHT_ONLY: the act quantizer's initial q_m comes
    # from the WEIGHT range and clips activations hard before any training
    # (initialize_quant_layer, quant_layers.py:413-440 — same as reference)
    qm2, qp2 = model_to_quantize_model(
        m, params, x, quant=QuantConfig(enabled=True, quantize_acts=False),
        init_bits=24.0)
    y_q = np.asarray(qm2.apply({"params": qp2}, x))
    np.testing.assert_allclose(y_q, y_f, rtol=1e-2, atol=1e-2)


def test_converted_mobilenet_runs():
    m = mobilenet_small()
    params, stats, x = _init(m)
    qm, qp = model_to_quantize_model(
        m, params, x, quant=QuantConfig(enabled=True, quantize_acts=False),
        init_bits=12.0)
    y = qm.apply({"params": qp, "batch_stats": stats}, x,
                 deterministic=True)
    assert np.isfinite(np.asarray(y)).all()


def test_converter_rejects_shape_mismatch():
    m = resnet8()
    params, stats, x = _init(m)
    params["stem_conv"]["kernel"] = params["stem_conv"]["kernel"][..., :8]
    with pytest.raises(ValueError, match="shape mismatch"):
        model_to_quantize_model(m, params, x)
