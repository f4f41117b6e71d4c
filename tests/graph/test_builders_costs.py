"""Direct tests for the graph layer: node-group builders, cost model, OTO
facade. (Indirect coverage exists via opt/cli tests; these pin semantics.)"""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO
from quantized_vit_tpu.graph.builders import (
    mark_unprunable,
    ultranet_node_groups,
    vit_node_groups,
)
from quantized_vit_tpu.graph.costs import ultranet_cost_report, vit_cost_report
from quantized_vit_tpu.models import (
    QuantConfig,
    UltraNet,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
)
from quantized_vit_tpu.opt.groups import Transform


def _vit(depth=2, quant=True, num_classes=6):
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=depth,
                    num_heads=2, num_classes=num_classes,
                    quant=QuantConfig(enabled=quant))
    model = VisionTransformer(cfg)
    params = flax.core.unfreeze(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32))["params"])
    if quant:
        params = init_quant_params_tree(params, init_bits=8.0)
    return cfg, model, params


def test_vit_groups_structure():
    cfg, model, params = _vit(depth=2)
    groups = {g.id: g for g in vit_node_groups(cfg, params)}

    # residual stream carries patch_embed/pos_embed/cls/proj/fc2/norms,
    # unprunable (pruning it would change embed_dim globally)
    rs = groups["residual_stream"]
    assert not rs.is_prunable
    assert rs.num_groups == cfg.embed_dim
    paths = {e.path for e in rs.entries}
    assert "cls_token" in paths and "pos_embed" in paths
    assert "blocks_0/attn/proj/kernel" in paths
    assert "blocks_1/mlp/fc2/kernel" in paths

    # attention group: per-head granularity, quant scalars NO_PRUNE
    attn = groups["blocks_0/attn"]
    assert attn.num_groups == cfg.num_heads
    tf = {e.path.split("/")[-1]: e.transform for e in attn.entries}
    assert tf["kernel"] == Transform.QKV_HEADS
    assert tf["d_quant_wt"] == Transform.NO_PRUNE

    # mlp group: fc1 hidden width
    mlp = groups["blocks_1/mlp"]
    assert mlp.num_groups == int(cfg.embed_dim * cfg.mlp_ratio)

    # head adjacent to output: unprunable (pruning_dependency.py:388-424)
    assert not groups["head"].is_prunable


def test_mark_unprunable_by_substring():
    cfg, model, params = _vit()
    groups = vit_node_groups(cfg, params)
    assert any(g.is_prunable for g in groups if "mlp" in g.id)
    mark_unprunable(groups, ["blocks_0/mlp/fc1"])
    g0 = next(g for g in groups if g.id == "blocks_0/mlp")
    g1 = next(g for g in groups if g.id == "blocks_1/mlp")
    assert not g0.is_prunable
    assert g1.is_prunable


def test_ultranet_groups_last_conv_unprunable():
    model = UltraNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 64, 3), jnp.float32))
    params = flax.core.unfreeze(variables["params"])
    groups = ultranet_node_groups(params)
    assert len(groups) == 9
    assert not groups[-1].is_prunable
    assert groups[0].num_groups == 16
    # BN scale/bias ride along as ACCESSORY
    tfs = {e.path: e.transform for e in groups[0].entries}
    assert tfs["bn_0/scale"] == Transform.ACCESSORY


def test_vit_cost_report_macs_match_hand_formula():
    cfg, model, params = _vit(depth=1, quant=False)
    rep = vit_cost_report(cfg, params)
    n_tok = cfg.num_patches + 1
    d = cfg.embed_dim
    # patch embed: one [n_patches, p*p*3] x [p*p*3, d] gemm per image
    patch = cfg.num_patches * (cfg.patch_size**2 * 3) * d
    qkv = n_tok * d * 3 * d
    proj = n_tok * d * d
    attn_mm = 2 * cfg.num_heads * n_tok * n_tok * (d // cfg.num_heads)
    mlp = 2 * n_tok * d * int(d * cfg.mlp_ratio)
    head = d * cfg.num_classes
    want = patch + qkv + proj + attn_mm + mlp + head
    assert rep["total_macs"] == pytest.approx(want, rel=1e-6)


def test_cost_report_bops_scale_with_bits():
    cfg, model, params = _vit(depth=1, quant=True)
    rep8 = vit_cost_report(cfg, params)
    params4 = init_quant_params_tree(params, init_bits=4.0)
    rep4 = vit_cost_report(cfg, params4)
    # same MACs, ~4x fewer BOPs at half the bits on both operands
    assert rep4["total_macs"] == rep8["total_macs"]
    assert rep4["total_bops"] < rep8["total_bops"] * 0.35
    assert rep4["average_bit_width"] < rep8["average_bit_width"]


def test_ultranet_cost_report_counts_all_convs():
    model = UltraNet()
    params = flax.core.unfreeze(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 160, 320, 3), jnp.float32))["params"])
    rep = ultranet_cost_report(params)
    assert len([k for k in rep["per_layer"] if k.startswith("conv")]) == 9
    # conv_0: 160*320 spatial, 3x3x3 kernel, 16 out
    want0 = 160 * 320 * 9 * 3 * 16
    assert rep["per_layer"]["conv_0"]["macs"] == pytest.approx(want0, rel=1e-6)


def test_oto_facade_visualize_and_metrics():
    cfg, model, params = _vit(depth=1)
    oto = OTO(model, params)
    dot = oto.visualize()
    assert "digraph" in dot and "blocks_0/attn" in dot
    assert oto.compute_num_params(params) > 0
    assert oto.compute_macs(params) > 0
    assert 2.0 < oto.compute_average_bit_width(params) <= 32.0


def test_oto_rejects_unknown_model():
    import flax.linen as nn

    class Other(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    m = Other()
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))["params"]
    with pytest.raises(ValueError, match="no node-group builder"):
        OTO(m, p)


def test_spread_runs_out_transform():
    """GroupNorm-style spread: num_groups coarser than the axis — each group
    covers a contiguous run (the reference's MULTIHEAD_NUMHEAD_SPREAD
    overwrite, pruning_dependency.py:426-538)."""
    import jax.numpy as jnp
    import numpy as np
    from quantized_vit_tpu.opt.groups import (
        Transform, group_matrix, group_mask_for_param, kept_indices_for_axis)

    k = jnp.arange(3 * 3 * 4 * 8, dtype=jnp.float32).reshape(3, 3, 4, 8)
    m = group_matrix(k, Transform.OUT, num_groups=4)  # 8 ch -> 4 GN groups
    assert m.shape == (4, 2 * 3 * 3 * 4)

    mask = jnp.array([1.0, 0.0, 0.0, 1.0])
    pm = group_mask_for_param(mask, Transform.OUT, k.shape)
    assert pm.shape == (1, 1, 1, 8)
    np.testing.assert_array_equal(
        np.asarray(pm[0, 0, 0]), [1, 1, 0, 0, 0, 0, 1, 1])

    idx = kept_indices_for_axis(np.array([0, 3]), Transform.OUT, 8,
                                num_groups=4)
    np.testing.assert_array_equal(idx, [0, 1, 6, 7])
