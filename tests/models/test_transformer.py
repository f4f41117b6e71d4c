"""Separate-q/k/v Transformer family: quant parity, pruning graph, subnet.

Covers the reference operator rows this family exists to exercise:
BertAttention/BaseMultiHeadAttentionOTO head pruning over three independent
projections (operator.py:810-975, 1012-1130) and EmbeddingOTO membership of
the residual stream (operator.py:677-706).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_vit_tpu.graph import OTO, transformer_node_groups
from quantized_vit_tpu.models import (
    QuantConfig,
    TransformerConfig,
    TransformerEncoder,
    init_quant_params_tree,
)

CFG = TransformerConfig(vocab_size=101, max_len=16, embed_dim=32, depth=2,
                        num_heads=4, num_classes=3,
                        quant=QuantConfig(enabled=True))


@pytest.fixture(scope="module")
def setup():
    model = TransformerEncoder(CFG)
    rng = np.random.default_rng(0)
    tokens = jnp.array(rng.integers(0, CFG.vocab_size, (2, 16)))
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), tokens)["params"])
    return model, params, tokens


def test_quantized_matches_fp32_at_high_bits(setup):
    """conftest.py:5-20 idiom: weight-quantized model ~= float twin at high
    init bit width (activation quant off — its init q_m is max|W|, far below
    real activation ranges; same setup as the ViT parity test)."""
    _, params, tokens = setup
    import dataclasses
    w_model = TransformerEncoder(dataclasses.replace(
        CFG, quant=QuantConfig(enabled=True, quantize_acts=False)))
    fp_model = TransformerEncoder(
        dataclasses.replace(CFG, quant=QuantConfig.off()))
    y_fp = fp_model.apply({"params": params}, tokens)
    qparams = init_quant_params_tree(params, init_bits=32.0)
    y_q = w_model.apply({"params": qparams}, tokens)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_fp),
                               rtol=1e-2, atol=1e-3)


def test_attention_mask_changes_only_masked_tokens(setup):
    model, params, tokens = setup
    params = init_quant_params_tree(params, init_bits=16.0)
    mask = jnp.ones((2, 16), jnp.int32).at[:, 10:].set(0)
    y_full = model.apply({"params": params}, tokens)
    y_mask = model.apply({"params": params}, tokens, attn_mask=mask)
    assert not np.allclose(np.asarray(y_full), np.asarray(y_mask))
    assert np.isfinite(np.asarray(y_mask)).all()


def test_node_groups_structure(setup):
    _, params, _ = setup
    groups = transformer_node_groups(CFG, params)
    by_id = {g.id: g for g in groups}
    assert not by_id["residual_stream"].is_prunable
    assert not by_id["head"].is_prunable
    paths = [e.path for e in by_id["residual_stream"].entries]
    assert "embed/embedding" in paths and "pos_embed" in paths
    attn = by_id["blocks_0/attn"]
    assert attn.num_groups == CFG.num_heads
    kinds = {e.path.split("/")[-2] for e in attn.entries}
    assert {"q", "k", "v"} <= kinds  # one decision spans all three


def test_subnet_construction_head_and_hidden_pruning(setup):
    model, params, tokens = setup
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(model, params)
    # zero heads {1, 3} of block 0 and hidden units [0:64] of block 1
    sparse = oto.random_set_zero_groups(params, target_group_sparsity=0.5)
    new_model, new_params = oto.construct_subnet(sparse)
    cfg2 = new_model.cfg
    assert cfg2.heads_per_block is not None
    assert all(h <= CFG.num_heads for h in cfg2.heads_per_block)
    assert any(h < CFG.num_heads for h in cfg2.heads_per_block)
    # q/k/v widths agree with kept heads; proj in-dim follows
    hd = CFG.embed_dim // CFG.num_heads
    for i in range(CFG.depth):
        h_i = cfg2.heads_per_block[i]
        for nm in ("q", "k", "v"):
            assert new_params[f"blocks_{i}"]["attn"][nm]["kernel"].shape[-1] \
                == h_i * hd
        assert new_params[f"blocks_{i}"]["attn"]["proj"]["kernel"].shape[0] \
            == h_i * hd
        assert new_params[f"blocks_{i}"]["fc1"]["kernel"].shape[-1] \
            == cfg2.hidden_per_block[i]
        assert new_params[f"blocks_{i}"]["fc2"]["kernel"].shape[0] \
            == cfg2.hidden_per_block[i]
    # compressed forward equals the sparse full forward (zero rows are inert)
    y_sparse = model.apply({"params": sparse}, tokens)
    y_new = new_model.apply({"params": new_params}, tokens)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_sparse),
                               rtol=1e-4, atol=1e-4)


def test_geta_step_and_costs(setup):
    model, params, tokens = setup
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(model, params)
    macs0 = oto.compute_macs(params)
    assert macs0 > 0
    opt = oto.geta(lr=1e-2, target_group_sparsity=0.5,
                   start_projection_step=1, projection_steps=2,
                   projection_periods=1, start_pruning_step=3,
                   pruning_steps=2, pruning_periods=1)

    def loss_fn(p):
        logits = model.apply({"params": p}, tokens)
        return jnp.mean(jnp.square(logits))

    p = params
    for _ in range(8):
        grads = jax.grad(loss_fn)(p)
        p = opt.step(p, opt.clip_grads(grads))
    assert np.isfinite(float(loss_fn(p)))
    # pruning fired: redundant groups (chosen globally across attn heads and
    # mlp hidden units) decayed to zero, so the subnet is strictly smaller
    new_model, new_params = oto.construct_subnet(p)
    cfg2 = new_model.cfg
    shrunk = (any(h < CFG.num_heads for h in cfg2.heads_per_block)
              or any(m < int(CFG.embed_dim * CFG.mlp_ratio)
                     for m in cfg2.hidden_per_block))
    assert shrunk
    assert oto.compute_macs(new_params) < macs0


# ---------------------------------------------------------------------------
# GQA + RoPE (Llama-style; the reference's LlamaAttention row extended)
# ---------------------------------------------------------------------------

GQA_CFG = TransformerConfig(vocab_size=101, max_len=16, embed_dim=32,
                            depth=2, num_heads=4, num_kv_heads=2,
                            num_classes=3, causal=True, rope=True,
                            quant=QuantConfig(enabled=True))


@pytest.fixture(scope="module")
def gqa_setup():
    model = TransformerEncoder(GQA_CFG)
    rng = np.random.default_rng(1)
    tokens = jnp.array(rng.integers(0, GQA_CFG.vocab_size, (2, 16)))
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), tokens)["params"])
    return model, params, tokens


def test_gqa_kv_projection_shapes(gqa_setup):
    model, params, tokens = gqa_setup
    hd = GQA_CFG.embed_dim // GQA_CFG.num_heads
    a = params["blocks_0"]["attn"]
    assert a["q"]["kernel"].shape[-1] == GQA_CFG.num_heads * hd
    assert a["k"]["kernel"].shape[-1] == GQA_CFG.num_kv_heads * hd
    assert a["v"]["kernel"].shape[-1] == GQA_CFG.num_kv_heads * hd
    y = model.apply({"params": params}, tokens)
    assert y.shape == (2, 3) and np.isfinite(np.asarray(y)).all()


def test_rope_rotation_properties():
    """rope_rotate: identity at position 0, norm-preserving, and the
    defining relative-position property <R_m q, R_n k> = f(q, k, m - n)."""
    from quantized_vit_tpu.models.transformer import rope_rotate

    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    pos = jnp.arange(6)
    r = rope_rotate(x, pos)
    # position 0 is untouched
    np.testing.assert_allclose(np.asarray(r[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-6)
    # rotation preserves vector norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # relative property: shifting both positions by s leaves scores alone
    q = jnp.array(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    k = jnp.array(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    s1 = np.einsum("bnhd,bmhd->bhnm", rope_rotate(q, pos),
                   rope_rotate(k, pos))
    s2 = np.einsum("bnhd,bmhd->bhnm", rope_rotate(q, pos + 3),
                   rope_rotate(k, pos + 3))
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
    # ...and absolute positions DO matter (not the identity map)
    assert np.abs(np.asarray(r[:, 1:]) - np.asarray(x[:, 1:])).max() > 0.1


def test_gqa_node_groups_at_kv_granularity(gqa_setup):
    model, params, tokens = gqa_setup
    groups = {g.id: g for g in transformer_node_groups(GQA_CFG, params)}
    attn = groups["blocks_0/attn"]
    assert attn.num_groups == GQA_CFG.num_kv_heads
    assert attn.num_heads == GQA_CFG.num_kv_heads


def test_gqa_prune_compress_is_lossless(gqa_setup):
    """Zeroing one KV head (and its query group) then slicing must preserve
    the forward exactly; heads_per_block stays in query heads."""
    model, params, tokens = gqa_setup
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(model, params)
    sparse = oto.random_set_zero_groups(
        params, target_group_sparsity=0.5, num_group_divisible=1, seed=5)
    y_sparse = np.asarray(model.apply({"params": sparse}, tokens))

    new_model, new_params = oto.construct_subnet(sparse)
    cfg2 = new_model.cfg
    hd = GQA_CFG.embed_dim // GQA_CFG.num_heads
    g = GQA_CFG.num_heads // GQA_CFG.num_kv_heads
    assert any(h < GQA_CFG.num_heads for h in cfg2.heads_per_block)
    for i, h_i in enumerate(cfg2.heads_per_block):
        assert h_i % g == 0  # whole kv groups only
        a = new_params[f"blocks_{i}"]["attn"]
        assert a["q"]["kernel"].shape[-1] == h_i * hd
        assert a["k"]["kernel"].shape[-1] == (h_i // g) * hd
        assert a["proj"]["kernel"].shape[0] == h_i * hd
    y_new = np.asarray(new_model.apply({"params": new_params}, tokens))
    np.testing.assert_allclose(y_new, y_sparse, rtol=1e-4, atol=1e-4)


def test_llama_style_swiglu_gqa_prune_compress_is_lossless():
    """Full Llama-style config: GQA + RoPE + causal + SwiGLU MLP. The gate
    and up kernels share the hidden pruning decision; slicing must keep
    silu(gate) * up exact."""
    cfg = TransformerConfig(vocab_size=101, max_len=16, embed_dim=32,
                            depth=2, num_heads=4, num_kv_heads=2,
                            num_classes=3, causal=True, rope=True,
                            mlp_type="swiglu",
                            quant=QuantConfig(enabled=True))
    m = TransformerEncoder(cfg)
    rng = np.random.default_rng(7)
    tokens = jnp.array(rng.integers(0, cfg.vocab_size, (2, 16)))
    params = flax.core.unfreeze(
        m.init(jax.random.PRNGKey(0), tokens)["params"])
    assert "gate" in params["blocks_0"]  # swiglu layers exist
    params = init_quant_params_tree(params, init_bits=8.0)

    groups = {g.id: g for g in transformer_node_groups(cfg, params)}
    paths = {e.path for e in groups["blocks_0/mlp"].entries}
    assert "blocks_0/gate/kernel" in paths and "blocks_0/fc1/kernel" in paths

    oto = OTO(m, params)
    sparse = oto.random_set_zero_groups(
        params, target_group_sparsity=0.5, num_group_divisible=1, seed=9)
    y_sparse = np.asarray(m.apply({"params": sparse}, tokens))
    new_model, new_params = oto.construct_subnet(sparse)
    h0 = new_model.cfg.hidden_per_block[0]
    assert h0 < int(cfg.embed_dim * cfg.mlp_ratio)
    assert new_params["blocks_0"]["gate"]["kernel"].shape[-1] == h0
    assert new_params["blocks_0"]["fc1"]["kernel"].shape[-1] == h0
    assert new_params["blocks_0"]["fc2"]["kernel"].shape[0] == h0
    y_new = np.asarray(new_model.apply({"params": new_params}, tokens))
    np.testing.assert_allclose(y_new, y_sparse, rtol=1e-4, atol=1e-4)


def test_oto_on_compressed_model_regroups_correctly(gqa_setup):
    """Regression: builders derived num_groups from dense config constants,
    so re-wrapping a compressed model in OTO (the post-training metrics
    pass) mis-grouped — a second pruning round could zero half of a
    surviving kv head or crash on a reshape. Groups must track the
    compressed param shapes."""
    model, params, tokens = gqa_setup
    params = init_quant_params_tree(params, init_bits=8.0)
    oto = OTO(model, params)
    sparse = oto.random_set_zero_groups(
        params, target_group_sparsity=0.5, num_group_divisible=1, seed=5)
    new_model, new_params = oto.construct_subnet(sparse)

    oto2 = OTO(new_model, new_params)
    by_id = {g.id: g for g in oto2.node_groups}
    hd = GQA_CFG.embed_dim // GQA_CFG.num_heads
    g_ratio = GQA_CFG.num_heads // GQA_CFG.num_kv_heads
    for i in range(GQA_CFG.depth):
        kv_i = new_model.cfg.heads_per_block[i] // g_ratio
        assert by_id[f"blocks_{i}/attn"].num_groups == kv_i
        assert by_id[f"blocks_{i}/mlp"].num_groups == \
            new_model.cfg.hidden_per_block[i]
    # a second group operation must run cleanly on the compressed shapes
    sparse2 = oto2.random_set_zero_groups(
        new_params, target_group_sparsity=0.4, num_group_divisible=1, seed=6)
    m3, p3 = oto2.construct_subnet(sparse2)
    y_sparse2 = np.asarray(new_model.apply({"params": sparse2}, tokens))
    y3 = np.asarray(m3.apply({"params": p3}, tokens))
    np.testing.assert_allclose(y3, y_sparse2, rtol=1e-4, atol=1e-4)
    # metrics work on the twice-compressed model too
    assert oto2.compute_macs(new_params) > 0
