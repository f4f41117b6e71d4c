"""GETA optimizer integration: schedule phases, projection clamps, pruning
to target sparsity, bit freezing, checkpoint round-trip, and subnet
construction parity — the behavior contract of geta.py:873-1026 on a tiny
quantized ViT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import OTO
from quantized_vit_tpu.models import (
    QuantConfig,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
)
from quantized_vit_tpu.opt import GETA, GETAConfig
from quantized_vit_tpu.opt.groups import get_path
from quantized_vit_tpu.quant.bitwidth import bit_width, d_for_bits


def _tiny_vit(quant=True, num_classes=10):
    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, num_classes=num_classes,
        quant=QuantConfig(enabled=True) if quant else QuantConfig.off(),
    )
    model = VisionTransformer(cfg)
    x = jnp.array(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                  jnp.float32)
    import flax

    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    if quant:
        params = init_quant_params_tree(params, init_bits=8.0)
    return cfg, model, params, x


def _loss_fn(model, params, x, y):
    logits = model.apply({"params": params}, x, deterministic=True)
    onehot = jax.nn.one_hot(y, logits.shape[-1])
    return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))


@pytest.fixture(scope="module")
def trained_geta():
    """Run a full mini GETA schedule; shared by several asserts."""
    cfg, model, params, x = _tiny_vit()
    y = jnp.array([1, 2])
    oto = OTO(model, params)
    opt = oto.geta(
        lr=5e-2, lr_quant=1e-3, variant="sgd",
        target_group_sparsity=0.3,
        start_projection_step=2, projection_steps=4, projection_periods=2,
        start_pruning_step=6, pruning_steps=6, pruning_periods=2,
        bit_reduction=2.0, min_bit_wt=4.0, max_bit_wt=8.0,
        min_bit_act=4.0, max_bit_act=8.0,
    )
    grad_fn = jax.jit(jax.grad(lambda p: _loss_fn(model, p, x, y)))
    max_bits_seen = [opt.max_bit_wt]
    for _ in range(16):
        grads = grad_fn(params)
        grads = opt.clip_grads(grads)
        params = opt.step(params, grads)
        max_bits_seen.append(opt.max_bit_wt)
    return cfg, model, params, opt, oto, max_bits_seen


def test_projection_rampdown(trained_geta):
    _, _, _, opt, _, seen = trained_geta
    assert seen[0] == 8.0
    assert min(seen) < 8.0  # rampdown happened (floored at max(min_bit, 6))
    assert min(seen) >= 6.0


def test_target_sparsity_reached(trained_geta):
    _, _, params, opt, _, _ = trained_geta
    m = opt.compute_metrics(params)
    assert m["num_zero_groups"] == opt.target_num_redundant_groups
    assert abs(m["group_sparsity"] - 0.3) < 0.05


def test_bit_dict_frozen_in_fix_phase(trained_geta):
    _, _, _, opt, _, _ = trained_geta
    assert opt.bit_layers  # frozen at step start_pruning+pruning_steps+1
    for lp, bits in opt.bit_layers.items():
        assert 2 <= bits["weight"] <= 16


def test_d_quant_clamped_to_frozen_bits(trained_geta):
    _, _, params, opt, _, _ = trained_geta
    for lp, bits in opt.bit_layers.items():
        d = get_path(params, f"{lp}/d_quant_wt")
        q_m = get_path(params, f"{lp}/q_m_wt")
        t = (get_path(params, f"{lp}/t_quant_wt")
             if opt.layers[lp]["nonlinear"] else None)
        target = d_for_bits(float(bits["weight"]), q_m, t)
        np.testing.assert_allclose(np.asarray(d), np.asarray(target),
                                   rtol=1e-5)


def test_subnet_construction_matches_sparse_forward(trained_geta):
    cfg, model, params, opt, oto, _ = trained_geta
    new_model, new_params = oto.construct_subnet(params)
    x = jnp.array(np.random.default_rng(5).standard_normal((2, 32, 32, 3)),
                  jnp.float32)
    full = model.apply({"params": params}, x, deterministic=True)
    slim = new_model.apply({"params": new_params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(slim),
                               rtol=1e-4, atol=1e-5)
    # something was actually pruned
    assert (sum(new_model.cfg.heads_per_block)
            + sum(new_model.cfg.hidden_per_block)) < (
        cfg.depth * cfg.num_heads
        + cfg.depth * int(cfg.embed_dim * cfg.mlp_ratio))


def test_checkpoint_roundtrip(tmp_path, trained_geta):
    cfg, model, params, opt, oto, _ = trained_geta
    from quantized_vit_tpu.opt import load_checkpoint, save_checkpoint, scan_checkpoint

    base = str(tmp_path / f"ckpt_{opt.num_steps}")
    save_checkpoint(base, params, opt.state_dict(), {"note": "test"})
    found = scan_checkpoint(str(tmp_path))
    assert found == base
    params2, opt_state, extra = load_checkpoint(found)
    assert extra["note"] == "test"

    opt2 = GETA(oto.node_groups, params2, opt.cfg)
    opt2.load_state_dict(opt_state)
    assert opt2.num_steps == opt.num_steps
    assert opt2.bit_layers == opt.bit_layers
    assert opt2.pruned_group_idxes == opt.pruned_group_idxes

    # one more identical step from both copies produces identical params
    x = jnp.array(np.random.default_rng(7).standard_normal((2, 32, 32, 3)),
                  jnp.float32)
    y = jnp.array([3, 4])
    g = jax.grad(lambda p: _loss_fn(model, p, x, y))(params)
    p_a = opt.step(params, opt.clip_grads(g))
    p_b = opt2.step(params2, opt2.clip_grads(g))
    flat_a = jax.tree.leaves(p_a)
    flat_b = jax.tree.leaves(p_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_range_projection_bounds_hold():
    """During the projection window, every layer's d_quant_wt stays inside
    [d(max_bit), d(min_bit)] (geta.py:598-665)."""
    cfg, model, params, x = _tiny_vit()
    y = jnp.array([0, 1])
    oto = OTO(model, params)
    opt = oto.geta(
        lr=1e-2, lr_quant=1e-3, variant="sgd",
        target_group_sparsity=0.2,
        start_projection_step=1, projection_steps=6, projection_periods=1,
        start_pruning_step=100, pruning_steps=4, pruning_periods=1,
        min_bit_wt=4.0, max_bit_wt=8.0, min_bit_act=4.0, max_bit_act=8.0,
    )
    grad_fn = jax.jit(jax.grad(lambda p: _loss_fn(model, p, x, y)))
    for _ in range(5):
        params = opt.step(params, opt.clip_grads(grad_fn(params)))
    for lp, meta in opt.layers.items():
        d = float(get_path(params, f"{lp}/d_quant_wt")[0])
        q_m = get_path(params, f"{lp}/q_m_wt")
        t = (get_path(params, f"{lp}/t_quant_wt") if meta["nonlinear"]
             else None)
        lo = float(d_for_bits(opt.max_bit_wt, q_m, t)[0])
        hi = float(d_for_bits(opt.cfg.min_bit_wt, q_m, t)[0])
        assert lo - 1e-7 <= d <= hi + 1e-7, lp


def test_hesso_prunes_to_target():
    cfg, model, params, x = _tiny_vit(quant=False)
    y = jnp.array([0, 1])
    oto = OTO(model, params)
    opt = oto.hesso(
        lr=1e-2, variant="sgd", target_group_sparsity=0.25,
        start_pruning_step=2, pruning_steps=4, pruning_periods=2,
    )
    grad_fn = jax.jit(jax.grad(lambda p: _loss_fn(model, p, x, y)))
    for _ in range(8):
        params = opt.step(params, grad_fn(params))
    m = opt.compute_metrics(params)
    assert m["num_zero_groups"] == opt.target_num_redundant_groups


def test_lora_no_prune_entries_keep_training_during_pruning():
    """Regression: non-quant NO_PRUNE entries of prune groups (lora_a) were
    frozen during prune-mode steps; they must keep receiving plain GD
    (LoraLinearOTO semantics — lora_a trains, only the decayed tensors and
    quant trio are withheld)."""
    import flax

    from quantized_vit_tpu.graph.builders import lora_layer_entries
    from quantized_vit_tpu.models import LoraDense
    from quantized_vit_tpu.opt import GETA, GETAConfig
    from quantized_vit_tpu.opt.groups import NodeGroup

    m = LoraDense(features=8, rank=2, alpha=4.0)
    x = jnp.array(np.random.default_rng(0).standard_normal((3, 6)),
                  jnp.float32)
    params = {"layer": flax.core.unfreeze(
        m.init(jax.random.PRNGKey(0), x)["params"])}
    rng = np.random.default_rng(1)
    params["layer"]["lora_a"] = jnp.array(
        rng.standard_normal(params["layer"]["lora_a"].shape) * 0.1,
        jnp.float32)
    g = NodeGroup(id="layer", entries=lora_layer_entries(params, "layer"),
                  num_groups=8)
    opt = GETA([g], params, GETAConfig(
        lr=1e-2, lr_quant=1e-3, target_group_sparsity=0.25,
        start_projection_step=100, projection_steps=10,
        projection_periods=1,
        start_pruning_step=1, pruning_steps=6, pruning_periods=1))
    ones = jax.tree.map(jnp.ones_like, params)
    p = params
    a_before = np.asarray(p["layer"]["lora_a"])
    for _ in range(4):  # inside the pruning window
        p = opt.step(p, ones)
    a_after = np.asarray(p["layer"]["lora_a"])
    assert not np.array_equal(a_before, a_after)  # lora_a trained
