"""LoRA adapters (models/lora.py) + pruning-graph integration: zero-init
identity, merge-lossless, grad masking, B.A importance proxy, group pruning
of (kernel + lora_b) rows together."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph.builders import (
    lora_embedding_entries,
    lora_layer_entries,
)
from quantized_vit_tpu.models import (
    LoraDense,
    LoraEmbedding,
    lora_grad_mask,
    merge_lora,
)
from quantized_vit_tpu.opt import HESSO, HESSOConfig, NodeGroup
from quantized_vit_tpu.opt.groups import ParamEntry, Transform
from quantized_vit_tpu.opt.importance import combine_importance_scores


def _layer(rank=4, features=12, in_dim=6, seed=0):
    m = LoraDense(features=features, rank=rank, alpha=8.0)
    x = jnp.array(np.random.default_rng(seed).standard_normal((3, in_dim)),
                  jnp.float32)
    params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), x)["params"])
    return m, params, x


def test_lora_zero_init_is_identity_with_base():
    m, params, x = _layer()
    base = x @ params["kernel"] + params["bias"]
    y = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), rtol=1e-6)


def test_merge_lora_is_lossless():
    m, params, x = _layer()
    rng = np.random.default_rng(1)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    params["lora_b"] = jnp.array(rng.standard_normal(
        params["lora_b"].shape) * 0.1, jnp.float32)
    y_adapted = np.asarray(m.apply({"params": params}, x))

    merged = merge_lora({"layer": params}, default_scaling=m.scaling)["layer"]
    assert "lora_a" not in merged and "lora_b" not in merged
    y_merged = np.asarray(x @ merged["kernel"] + merged["bias"])
    np.testing.assert_allclose(y_merged, y_adapted, rtol=1e-5, atol=1e-6)


def test_lora_grad_mask_marks_only_adapters():
    m, params, x = _layer()
    mask = lora_grad_mask({"layer": params, "other": {"kernel": params["kernel"]}})
    assert mask["layer"]["lora_a"] is True
    assert mask["layer"]["lora_b"] is True
    assert mask["layer"]["kernel"] is False
    assert mask["layer"]["bias"] is False
    assert mask["other"]["kernel"] is False


def _lora_group(params):
    return NodeGroup(
        id="layer", entries=lora_layer_entries({"layer": params}, "layer"),
        num_groups=params["kernel"].shape[-1])


def test_lora_importance_uses_ba_proxy():
    """With frozen base (zero grads everywhere), the taylor/cosine criteria
    still rank groups via the A@B proxy against the base kernel."""
    m, params, x = _layer()
    rng = np.random.default_rng(2)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    params["lora_b"] = jnp.array(rng.standard_normal(
        params["lora_b"].shape) * 0.1, jnp.float32)
    tree = {"layer": params}
    zero_grads = jax.tree.map(jnp.zeros_like, tree)
    g = _lora_group(params)
    scores, _ = combine_importance_scores(
        [g], tree, zero_grads, {"taylor_first_order": 1.0})
    scores = np.asarray(scores)
    assert np.all(np.isfinite(scores))
    assert scores.std() > 0  # proxy produced varied saliency

    # hand-check: |sum(base * (A@B)) per out column|, globally normalized
    ba = np.asarray(params["lora_a"] @ params["lora_b"])
    base = np.asarray(params["kernel"])
    raw = np.abs((base * ba).sum(axis=0))
    want = raw / (np.sqrt((raw ** 2).sum() + 1e-8) + 1e-8)
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-6)


def _emb_layer(vocab=10, features=12, rank=4, seed=0):
    m = LoraEmbedding(num_embeddings=vocab, features=features, rank=rank,
                      alpha=8.0)
    ids = jnp.array(np.random.default_rng(seed).integers(0, vocab, (3, 5)))
    params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), ids)["params"])
    return m, params, ids


def test_lora_embedding_zero_init_is_identity_with_base():
    m, params, ids = _emb_layer()
    base = np.asarray(jnp.take(params["embedding"], ids, axis=0))
    y = np.asarray(m.apply({"params": params}, ids))
    np.testing.assert_allclose(y, base, rtol=1e-6)


def test_merge_lora_embedding_is_lossless():
    m, params, ids = _emb_layer()
    rng = np.random.default_rng(1)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    y_adapted = np.asarray(m.apply({"params": params}, ids))

    merged = merge_lora({"emb": params}, default_scaling=m.scaling)["emb"]
    assert "lora_a" not in merged and "lora_b" not in merged
    y_merged = np.asarray(jnp.take(merged["embedding"], ids, axis=0))
    np.testing.assert_allclose(y_merged, y_adapted, rtol=1e-5, atol=1e-6)


def test_lora_embedding_importance_uses_ba_proxy():
    """Frozen base: taylor saliency comes from the A@B proxy against the
    base embedding table (LoraEmbeddingOTO + importance lora variants)."""
    m, params, ids = _emb_layer()
    rng = np.random.default_rng(2)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    tree = {"emb": params}
    g = NodeGroup(id="emb",
                  entries=lora_embedding_entries(tree, "emb"),
                  num_groups=params["embedding"].shape[-1])
    scores, _ = combine_importance_scores(
        [g], tree, jax.tree.map(jnp.zeros_like, tree),
        {"taylor_first_order": 1.0})
    scores = np.asarray(scores)
    ba = np.asarray(params["lora_a"] @ params["lora_b"])
    base = np.asarray(params["embedding"])
    raw = np.abs((base * ba).sum(axis=0))
    want = raw / (np.sqrt((raw ** 2).sum() + 1e-8) + 1e-8)
    np.testing.assert_allclose(scores, want, rtol=1e-4, atol=1e-6)


def test_hesso_prunes_lora_embedding_features_with_base():
    m, params, ids = _emb_layer(features=8)
    rng = np.random.default_rng(3)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    tree = {"emb": params}
    g = NodeGroup(id="emb",
                  entries=lora_embedding_entries(tree, "emb"),
                  num_groups=8)
    opt = HESSO([g], tree, HESSOConfig(
        lr=0.0, target_group_sparsity=0.25,
        start_pruning_step=1, pruning_steps=6, pruning_periods=1))
    p = tree
    for _ in range(8):
        p = opt.step(p, jax.tree.map(jnp.zeros_like, p))
    emb = np.asarray(p["emb"]["embedding"])
    b = np.asarray(p["emb"]["lora_b"])
    a = np.asarray(p["emb"]["lora_a"])
    zero_cols = np.abs(emb).sum(axis=0) == 0
    assert zero_cols.sum() == 2
    assert (np.abs(b).sum(axis=0)[zero_cols] == 0).all()
    assert (np.abs(a) > 0).any()  # lora_a NO_PRUNE


def test_hesso_prunes_lora_rows_with_base():
    m, params, x = _layer(features=8)
    rng = np.random.default_rng(3)
    params["lora_a"] = jnp.array(rng.standard_normal(
        params["lora_a"].shape) * 0.1, jnp.float32)
    params["lora_b"] = jnp.array(rng.standard_normal(
        params["lora_b"].shape) * 0.1, jnp.float32)
    tree = {"layer": params}
    g = _lora_group(params)
    opt = HESSO([g], tree, HESSOConfig(
        lr=0.0, target_group_sparsity=0.25,
        start_pruning_step=1, pruning_steps=6, pruning_periods=1))
    p = tree
    for i in range(8):
        p = opt.step(p, jax.tree.map(jnp.zeros_like, p))
    k = np.asarray(p["layer"]["kernel"])
    b = np.asarray(p["layer"]["lora_b"])
    a = np.asarray(p["layer"]["lora_a"])
    zero_cols = np.abs(k).sum(axis=0) == 0
    assert zero_cols.sum() == 2  # 8 * 0.25
    # lora_b columns pruned WITH the base; lora_a untouched (NO_PRUNE)
    assert (np.abs(b).sum(axis=0)[zero_cols] == 0).all()
    assert (np.abs(a) > 0).any()
