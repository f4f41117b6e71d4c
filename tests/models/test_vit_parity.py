"""ViT parity vs the reference torch model (BASELINE.json config 3 idiom).

Builds a small ViT in both frameworks with identical weights and asserts
logit parity; then checks the reference's core testing idiom (quantized model
~= fp32 model at high init bit width, conftest.py:5-20 compare_outputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.models import (
    QuantConfig,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
    collect_quant_params,
    bitwidth_dict,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

SMALL = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
             num_classes=10)


@pytest.fixture(scope="module")
def ref_vit_mod():
    return load_reference_module("QViT_with_GETA/vit_model.py", "ref_vit_model")


def _port_linear(params, tmod):
    params["kernel"] = jnp.array(tmod.weight.detach().numpy().T)
    if tmod.bias is not None:
        params["bias"] = jnp.array(tmod.bias.detach().numpy())


def _port_ln(params, tmod):
    params["scale"] = jnp.array(tmod.weight.detach().numpy())
    params["bias"] = jnp.array(tmod.bias.detach().numpy())


def port_vit_weights(params, ref_model, depth):
    """torch VisionTransformer state -> flax params pytree (in place)."""
    pe = ref_model.patch_embed.proj
    params["patch_embed"]["proj"]["kernel"] = jnp.array(
        pe.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    )
    params["patch_embed"]["proj"]["bias"] = jnp.array(pe.bias.detach().numpy())
    params["cls_token"] = jnp.array(ref_model.cls_token.detach().numpy())
    params["pos_embed"] = jnp.array(ref_model.pos_embed.detach().numpy())
    for i in range(depth):
        blk = ref_model.blocks[i]
        p = params[f"blocks_{i}"]
        _port_ln(p["norm1"], blk.norm1)
        _port_linear(p["attn"]["qkv"], blk.attn.qkv)
        _port_linear(p["attn"]["proj"], blk.attn.proj)
        _port_ln(p["norm2"], blk.norm2)
        _port_linear(p["mlp"]["fc1"], blk.mlp.fc1)
        _port_linear(p["mlp"]["fc2"], blk.mlp.fc2)
    _port_ln(params["norm"], ref_model.norm)
    _port_linear(params["head"], ref_model.head)
    return params


def test_fp32_vit_matches_reference(ref_vit_mod):
    ref = ref_vit_mod.VisionTransformer(
        representation_size=None, drop_ratio=0.0, attn_drop_ratio=0.0,
        drop_path_ratio=0.0, **SMALL,
    )
    ref.eval()

    cfg = ViTConfig(quant=QuantConfig.off(), **SMALL)
    model = VisionTransformer(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    params = port_vit_weights(dict(params), ref, SMALL["depth"])

    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-4)


def _merge_weights(qp, fp):
    out = {}
    for k, v in qp.items():
        if isinstance(v, dict):
            out[k] = _merge_weights(v, fp[k]) if k in fp else v
        else:
            out[k] = fp[k] if (k in fp) else v
    return out


def test_weightonly_quantized_vit_close_to_fp32_at_high_bits():
    """The reference's core test idiom (tests/conftest.py:5-20): at 32 init
    bits weight quantization is ~identity. WEIGHT_ONLY mode — in W&A mode the
    act quantizer clamps |x| at q_m=max|W| which distorts LN-scale
    activations at init in the reference too (quant_layers.py:436-440 inits
    act params from the weights)."""
    import flax

    cfg_fp = ViTConfig(quant=QuantConfig.off(), **SMALL)
    cfg_q = ViTConfig(
        quant=QuantConfig(enabled=True, quantize_acts=False), **SMALL
    )
    m_fp = VisionTransformer(cfg_fp)
    m_q = VisionTransformer(cfg_q)

    rng = np.random.default_rng(1)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    fp_params = m_fp.init(jax.random.PRNGKey(0), x)["params"]
    q_params = m_q.init(jax.random.PRNGKey(0), x)["params"]
    q_params = _merge_weights(
        flax.core.unfreeze(q_params), flax.core.unfreeze(fp_params)
    )
    q_params = init_quant_params_tree(q_params, init_bits=32.0)

    y_fp = np.asarray(m_fp.apply({"params": fp_params}, x))
    y_q = np.asarray(m_q.apply({"params": q_params}, x))
    np.testing.assert_allclose(y_q, y_fp, rtol=1e-2, atol=1e-3)


def test_quantized_vit_matches_reference_quantized_vit(ref_vit_mod):
    """Gold parity: reference model_to_quantize_model(num_bits=32, NONLINEAR,
    WEIGHT_AND_ACTIVATION) vs our QuantConfig(enabled) with ported weights —
    both models apply the same act clamping, so outputs must agree tightly."""
    import flax

    ref_ql = load_reference_module(
        "QViT_with_GETA/only_train_once/quantization/quant_layers.py",
        "ref_quant_layers_for_model",
    )
    ref = ref_vit_mod.VisionTransformer(
        representation_size=None, drop_ratio=0.0, attn_drop_ratio=0.0,
        drop_path_ratio=0.0, **SMALL,
    )
    ref.eval()

    # model_to_quantize_model's swap loop (quant_model.py:15-82), inlined
    # because the reference file only imports relatively.
    def swap(model):
        for name, child in list(model.named_children()):
            if isinstance(child, torch.nn.Linear):
                setattr(model, name, ref_ql.QuantizeLinear.from_module(
                    child, quant_type=ref_ql.QuantizationType.SYMMETRIC_NONLINEAR,
                    quant_mode=ref_ql.QuantizationMode.WEIGHT_AND_ACTIVATION,
                    num_bits=32))
            elif isinstance(child, torch.nn.Conv2d):
                setattr(model, name, ref_ql.QuantizeConv2d.from_module(
                    child, quant_type=ref_ql.QuantizationType.SYMMETRIC_NONLINEAR,
                    quant_mode=ref_ql.QuantizationMode.WEIGHT_AND_ACTIVATION,
                    num_bits=32))
            else:
                swap(child)
        return model

    ref_q = swap(ref)
    ref_q.eval()

    cfg_q = ViTConfig(
        quant=QuantConfig(enabled=True, nonlinear=True, quantize_acts=True),
        **SMALL,
    )
    model = VisionTransformer(cfg_q)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    )
    params = port_vit_weights(params, ref_q, SMALL["depth"])
    params = init_quant_params_tree(params, init_bits=32.0)

    with torch.no_grad():
        ref_out = ref_q(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=1e-3)


def test_quant_param_inventory_matches_reference_count():
    """ViT-B has 200 learnable quant scalars in W&A nonlinear mode:
    (1 patch conv + 1 head + 12*4 linears) * 6... reference counts 200 via
    4 per patch_embed + 4 per head + 16 per block (train.py:320-322) —
    that's with (d, q_m) x (wt, act) = 4 per layer in LINEAR mode.
    Check both modes on a small depth-2 model: layers = 1 + 1 + 4*depth."""
    n_layers = 2 + 4 * SMALL["depth"]
    cfg_lin = ViTConfig(
        quant=QuantConfig(enabled=True, nonlinear=False), **SMALL
    )
    m = VisionTransformer(cfg_lin)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    qp = collect_quant_params(params)
    total = sum(len(v) for v in qp.values())
    assert len(qp) == n_layers
    assert total == n_layers * 4  # (d, q_m) x (wt, act)

    cfg_nl = ViTConfig(quant=QuantConfig(enabled=True, nonlinear=True), **SMALL)
    params_nl = VisionTransformer(cfg_nl).init(jax.random.PRNGKey(0), x)["params"]
    qp_nl = collect_quant_params(params_nl)
    assert sum(len(v) for v in qp_nl.values()) == n_layers * 6

    bits = bitwidth_dict(init_quant_params_tree(
        __import__("flax").core.unfreeze(params_nl), init_bits=8.0))
    for path, entry in bits.items():
        assert abs(entry["weight_bit"] - 8.0) < 0.1, (path, entry)


def test_vit_b16_param_count():
    """ViT-B/16 in21k ~= 86M backbone params (BASELINE.md)."""
    from quantized_vit_tpu.models import vit_base_patch16_224

    m = vit_base_patch16_224(num_classes=10)
    params = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    )["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 85e6 < n < 87e6, n
