"""Depthwise-separable family: the reference's depthwise-conv merge
semantics (pruning_dependency.py:203-238) — a depthwise conv's channels are
locked to the producing layer's group — exercised through node groups,
HESSO pruning, and lossless subnet slicing."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO, mobilenet_node_groups
from quantized_vit_tpu.models import (
    MobileNet,
    MobileNetConfig,
    QuantConfig,
    init_quant_params_tree,
    mobilenet_small,
)
from quantized_vit_tpu.opt.groups import Transform


def _init(model, seed=0, batch=2):
    x = jnp.array(np.random.default_rng(seed).standard_normal(
        (batch, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return (flax.core.unfreeze(variables["params"]),
            flax.core.unfreeze(variables["batch_stats"]), x)


def _apply(model, params, stats, x):
    return model.apply({"params": params, "batch_stats": stats}, x,
                       deterministic=True)


def test_depthwise_conv_shapes_and_forward():
    m = mobilenet_small()
    params, stats, x = _init(m)
    # depthwise kernels have a single input channel
    assert params["dw_0"]["kernel"].shape == (3, 3, 1, 8)
    assert params["dw_1"]["kernel"].shape == (3, 3, 1, 16)
    y = _apply(m, params, stats, x)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_node_groups_merge_depthwise_into_producer():
    m = mobilenet_small(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    groups = {g.id: g for g in mobilenet_node_groups(m.cfg, params)}

    stem = groups["stem"]
    paths = {e.path for e in stem.entries}
    # dw_0 + its BN merged into the stem group (pzig step 7)
    assert "stem_conv/kernel" in paths
    assert "dw_0/kernel" in paths
    assert "dw_bn_0/scale" in paths
    assert stem.num_groups == m.cfg.stem_width

    pw0 = groups["pw_0"]
    paths0 = {e.path for e in pw0.entries}
    assert "pw_0/kernel" in paths0 and "dw_1/kernel" in paths0
    # last pointwise group has no following depthwise
    last = groups[f"pw_{len(m.cfg.widths) - 1}"]
    assert not any("dw_" in e.path for e in last.entries)
    # quant scalars ride NO_PRUNE
    tf = {e.path: e.transform for e in pw0.entries}
    assert tf["pw_0/d_quant_wt"] == Transform.NO_PRUNE
    assert not groups["head"].is_prunable


def test_zero_groups_then_compress_is_lossless():
    m = mobilenet_small(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    sparse = oto.random_set_zero_groups(
        target_group_sparsity=0.4, num_group_divisible=1, seed=3)
    y_sparse = np.asarray(_apply(m, sparse, stats, x))

    new_model, new_params, new_stats = oto.construct_subnet(sparse)
    assert new_model.cfg.widths != m.cfg.widths
    # depthwise kernels shrank WITH their producers
    for i, w in enumerate(new_model.cfg.widths[:-1]):
        assert new_params[f"dw_{i + 1}"]["kernel"].shape[-1] == w
    y_comp = np.asarray(_apply(new_model, new_params, new_stats, x))
    np.testing.assert_allclose(y_comp, y_sparse, rtol=1e-4, atol=1e-5)


def test_cost_report_counts_depthwise_cheaply():
    m = mobilenet_small(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    report = oto._report(params)
    # depthwise MACs ~= k^2/C_out of the pointwise MACs at same spatial dims
    assert report["per_layer"]["dw_1"]["macs"] < \
        report["per_layer"]["pw_1"]["macs"]
    assert oto.compute_macs(params) > 0
    # quantized weights at 8b, BN/bias params at 32b -> average in between
    avg = oto.compute_average_bit_width(params)
    assert 8.0 < avg < 32.0


def test_hesso_prunes_mobilenet_to_target():
    m = mobilenet_small(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(m, params, batch_stats=stats)
    opt = oto.hesso(lr=1e-2, target_group_sparsity=0.3,
                    start_pruning_step=2, pruning_steps=8,
                    pruning_periods=2)

    def loss_fn(p):
        y = m.apply({"params": p, "batch_stats": stats}, x,
                    deterministic=True)
        return jnp.mean(jnp.square(y))

    p = params
    for _ in range(14):
        grads = jax.grad(loss_fn)(p)
        p = opt.step(p, grads)
    m2, p2, s2 = oto.construct_subnet(p)
    total_before = sum(m.cfg.widths) + m.cfg.stem_width
    total_after = sum(m2.cfg.widths) + m2.cfg.stem_width
    assert total_after < total_before
    y = _apply(m2, p2, s2, x)
    assert np.isfinite(np.asarray(y)).all()
