"""ResNet family: quantized-vs-fp32 parity (the reference's ResNet-50 idiom,
test_quant_model.py:31-110), residual-aware node groups, and LOSSLESS
group-sparse -> compressed-subnet slicing."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO, resnet_node_groups
from quantized_vit_tpu.models import (
    QuantConfig,
    ResNet,
    ResNetConfig,
    init_quant_params_tree,
    resnet8,
)


def _init(model, seed=0, batch=2):
    x = jnp.array(np.random.default_rng(seed).standard_normal(
        (batch, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return (flax.core.unfreeze(variables["params"]),
            flax.core.unfreeze(variables["batch_stats"]), x)


def _apply(model, params, stats, x):
    return model.apply({"params": params, "batch_stats": stats}, x,
                       deterministic=True)


def test_quantized_resnet_matches_fp32_at_high_bits():
    """model_to_quantize_model parity idiom: at a high initial bit width the
    fake-quant model ~= the float model (test_quant_model.py:38-40 uses
    rtol 1e-2 on ResNet-50). Weight-only mode: the activation quantizer's
    initial q_m comes from the WEIGHT range (initialize_quant_layer,
    quant_layers.py:413-440) and would clip ReLU activations hard before
    any training — same as the reference."""
    m_f = resnet8()
    params, stats, x = _init(m_f)
    y_f = np.asarray(_apply(m_f, params, stats, x))

    m_q = resnet8(quant=QuantConfig(enabled=True, quantize_acts=False))
    q_params, _, _ = _init(m_q)

    def copy_common(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                copy_common(dst[k], v)
            else:
                dst[k] = v

    copy_common(q_params, params)
    q_params = init_quant_params_tree(q_params, init_bits=16.0)
    y_q = np.asarray(_apply(m_q, q_params, stats, x))
    np.testing.assert_allclose(y_q, y_f, rtol=1e-2, atol=1e-2)


def test_resnet_node_groups_structure():
    m = resnet8(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    groups = {g.id: g for g in resnet_node_groups(m.cfg, params)}

    # per-stage stream groups tie conv2 of every block + downsample + stem
    s0 = groups["stream_0"]
    paths = {e.path for e in s0.entries}
    assert "stem_conv/kernel" in paths
    assert "stage0_block0/conv2/kernel" in paths
    assert s0.num_groups == 16 and s0.is_prunable

    s1 = groups["stream_1"]
    paths1 = {e.path for e in s1.entries}
    assert "stage1_block0/down_conv/kernel" in paths1
    assert "stage1_block0/bn2/scale" in paths1

    # block-inner groups prune conv1 rows independently
    b = groups["stage2_block0"]
    assert b.num_groups == 64
    # quant scalars ride NO_PRUNE
    from quantized_vit_tpu.opt.groups import Transform

    tf = {e.path.split("/")[-1]: e.transform for e in b.entries}
    assert tf["d_quant_wt"] == Transform.NO_PRUNE
    assert not groups["head"].is_prunable


def test_resnet_zero_groups_then_compress_is_lossless():
    """Channels whose (conv out + BN scale/bias) rows are zero contribute
    nothing; slicing them away must not change the output at all — for both
    inner (conv1) groups and the residual-stream groups."""
    m = resnet8(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    sparse = oto.random_set_zero_groups(
        target_group_sparsity=0.4, num_group_divisible=1, seed=7)
    y_sparse = np.asarray(_apply(m, sparse, stats, x))

    new_model, new_params, new_stats = oto.construct_subnet(sparse)
    assert new_model.cfg.widths != m.cfg.widths  # streams shrank
    assert new_model.cfg.inner_widths is not None
    y_comp = np.asarray(_apply(new_model, new_params, new_stats, x))
    np.testing.assert_allclose(y_comp, y_sparse, rtol=1e-4, atol=1e-5)


def test_resnet_cost_report_decreases_after_compression():
    m = resnet8(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    full_macs = oto.compute_macs(params)
    full_params = oto.compute_num_params(params)

    sparse = oto.random_set_zero_groups(
        target_group_sparsity=0.5, num_group_divisible=1, seed=2)
    new_model, new_params, new_stats = oto.construct_subnet(sparse)
    oto2 = OTO(new_model, new_params, batch_stats=new_stats)
    assert oto2.compute_macs(new_params) < full_macs
    assert oto2.compute_num_params(new_params) < full_params
    assert oto.compute_average_bit_width(params) == pytest.approx(8.0, abs=1)


def test_resnet_geta_trains_and_prunes():
    """GETA over the residual-CNN groups drives group sparsity to target."""
    m = resnet8(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    opt = oto.hesso(lr=1e-3, target_group_sparsity=0.3,
                    start_pruning_step=2, pruning_steps=8,
                    pruning_periods=2)
    rng = np.random.default_rng(0)
    p = params
    for i in range(14):
        grads = jax.tree.map(
            lambda a: jnp.array(rng.standard_normal(a.shape) * 1e-3,
                                jnp.float32), p)
        p = opt.step(p, grads)
    met = opt.compute_metrics(p)
    assert met["group_sparsity"] == pytest.approx(0.3, abs=0.05)
    # compressed net still runs
    new_model, new_params, new_stats = oto.construct_subnet(p)
    out = _apply(new_model, new_params, new_stats, x)
    assert out.shape == (2, 10)
