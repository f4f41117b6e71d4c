"""Subnet construction: slicing a group-zeroed model must preserve the
forward exactly (the contract behind pruning_compression.py:4-391 — removed
groups contribute zero, so the dense subnet equals the sparse net)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.compress import (
    construct_subnet_ultranet,
    construct_subnet_vit,
)
from quantized_vit_tpu.graph import ultranet_node_groups, vit_node_groups
from quantized_vit_tpu.models import (
    QuantConfig,
    UltraNet,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
)
from quantized_vit_tpu.opt.groups import (
    Transform,
    get_path,
    group_mask_for_param,
    set_path,
)


def _zero_groups(params, group, idxes):
    mask = np.zeros((group.num_groups,), np.float32)
    mask[np.asarray(idxes)] = 1.0
    for e in group.entries:
        if e.transform == Transform.NO_PRUNE:
            continue
        p = get_path(params, e.path)
        m = group_mask_for_param(jnp.array(mask), e.transform, p.shape,
                                 group.num_heads)
        params = set_path(params, e.path, p * (1.0 - m))
    return params


@pytest.mark.parametrize("quant", [False, True])
def test_vit_subnet_forward_parity(quant):
    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
        mlp_ratio=2.0, num_classes=7,
        quant=QuantConfig(enabled=True) if quant else QuantConfig.off(),
    )
    model = VisionTransformer(cfg)
    x = jnp.array(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    if quant:
        params = init_quant_params_tree(params, init_bits=8.0)

    groups = vit_node_groups(cfg, params)
    by_id = {g.id: g for g in groups}
    # prune heads {1, 3} of block 0 and hidden units 0..9 of block 1
    params = _zero_groups(params, by_id["blocks_0/attn"], [1, 3])
    params = _zero_groups(params, by_id["blocks_1/mlp"], list(range(10)))

    full = model.apply({"params": params}, x, deterministic=True)

    new_cfg, new_params = construct_subnet_vit(cfg, params, groups)
    assert new_cfg.heads_per_block == (2, 4)
    assert new_cfg.hidden_per_block == (64, 54)
    slim_model = VisionTransformer(new_cfg)
    slim = slim_model.apply({"params": new_params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(slim),
                               rtol=1e-5, atol=1e-6)
    # shapes really shrank
    assert get_path(new_params, "blocks_0/attn/qkv/kernel").shape[-1] == 3 * 2 * 8
    assert get_path(new_params, "blocks_1/mlp/fc1/kernel").shape[-1] == 54


def test_ultranet_subnet_forward_parity():
    model = UltraNet()
    x = jnp.array(np.random.default_rng(1).standard_normal((1, 32, 64, 3)),
                  jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    groups = ultranet_node_groups(params)
    by_id = {g.id: g for g in groups}
    params = _zero_groups(params, by_id["conv_2"], [0, 5, 9])
    params = _zero_groups(params, by_id["conv_6"], [1])

    io_full, p_full = model.apply(
        {"params": params, "batch_stats": stats}, x, train=False)

    channels, new_params, new_stats = construct_subnet_ultranet(
        params, groups, stats)
    assert channels[2] == 61 and channels[6] == 63
    slim = UltraNet(channels=channels)
    io_slim, p_slim = slim.apply(
        {"params": new_params, "batch_stats": new_stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(io_full), np.asarray(io_slim),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_slim),
                               rtol=1e-5, atol=1e-6)


def test_cost_report_shrinks_after_compression():
    from quantized_vit_tpu.graph import vit_cost_report

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                    num_heads=4, mlp_ratio=2.0, num_classes=7)
    model = VisionTransformer(cfg)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    groups = vit_node_groups(cfg, params)
    by_id = {g.id: g for g in groups}
    params = _zero_groups(params, by_id["blocks_0/attn"], [0, 1])
    before = vit_cost_report(cfg, params)
    new_cfg, new_params = construct_subnet_vit(cfg, params, groups)
    after = vit_cost_report(new_cfg, new_params)
    assert after["total_macs"] < before["total_macs"]
    assert after["num_params"] < before["num_params"]
    assert after["total_bops"] < before["total_bops"]
