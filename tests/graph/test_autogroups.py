"""Automatic pzig discovery from the jaxpr (graph/autogroups.py) vs the
declarative family builders — the fixed point the reference's
pruning_dependency.py partition computes (steps 1-10), reproduced by
dataflow analysis with NO torch.jit/ONNX and no per-family declarations.

Scope mirrors the reference: basic architectures (convnets with
BN/residual/depthwise, MLPs) are discovered; composed attention stays
declarative (the reference's COMPOSED_MODULES registry,
operator.py:1422-1438) — on a ViT the discovery must degrade
CONSERVATIVELY (unprunable, never wrong)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.graph import (
    discover_node_groups,
    mobilenet_node_groups,
    resnet_node_groups,
    ultranet_node_groups,
)
from quantized_vit_tpu.models import (
    QuantConfig,
    UltraNet,
    ViTConfig,
    VisionTransformer,
    mobilenet_small,
    resnet8,
    resnet20,
)
from quantized_vit_tpu.opt.groups import Transform


def _init(model, shape=(1, 32, 32, 3)):
    x = jnp.zeros(shape, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(v["params"])
    stats = (flax.core.unfreeze(v["batch_stats"])
             if "batch_stats" in v else None)
    return params, stats, x


def _content(groups):
    """Comparable content: frozenset of (sorted entry paths+transforms,
    num_groups, prunable) per group — ids are naming, not semantics."""
    return {
        (tuple(sorted((e.path, e.transform.value) for e in g.entries)),
         g.num_groups, g.is_prunable)
        for g in groups
    }


def test_ultranet_discovery_matches_declarative():
    m = UltraNet()
    params, stats, x = _init(m, (1, 32, 64, 3))
    found = discover_node_groups(m, params, x, batch_stats=stats,
                                 model_kwargs={"train": False})
    assert _content(found) == _content(ultranet_node_groups(params))


def test_mobilenet_discovery_matches_declarative_incl_depthwise_merge():
    m = mobilenet_small()
    params, stats, x = _init(m)
    found = discover_node_groups(m, params, x, batch_stats=stats,
                                 model_kwargs={"deterministic": True})
    assert _content(found) == _content(mobilenet_node_groups(m.cfg, params))
    # the depthwise kernels were merged into their producers (pzig step 7)
    by_paths = {tuple(sorted(e.path for e in g.entries)): g for g in found}
    stem = next(g for g in found
                if any(e.path == "stem_conv/kernel" for e in g.entries))
    assert any(e.path == "dw_0/kernel" for e in stem.entries)


def test_resnet_discovery_matches_declarative_incl_residual_merge():
    m = resnet8()
    params, stats, x = _init(m)
    found = discover_node_groups(m, params, x, batch_stats=stats,
                                 model_kwargs={"deterministic": True})
    assert _content(found) == _content(resnet_node_groups(m.cfg, params))


def test_resnet20_streams_merge_all_blocks():
    m = resnet20()
    params, stats, x = _init(m)
    found = discover_node_groups(m, params, x, batch_stats=stats,
                                 model_kwargs={"deterministic": True})
    assert _content(found) == _content(resnet_node_groups(m.cfg, params))
    # each stage's stream spans conv2 of all 3 blocks (+ downsample)
    stream1 = next(
        g for g in found
        if any(e.path == "stage1_block0/down_conv/kernel"
               for e in g.entries))
    kernels = {e.path for e in stream1.entries if e.path.endswith("kernel")}
    assert kernels == {
        "stage1_block0/conv2/kernel", "stage1_block0/down_conv/kernel",
        "stage1_block1/conv2/kernel", "stage1_block2/conv2/kernel",
    }


def test_quantized_model_discovery_sees_through_fake_quant():
    """LSFQ layers run the kernel through quantizer math before the conv —
    the traced-quantizer situation the reference collapses
    (graph.py:525-662); provenance-based stem detection must still find
    every kernel and keep quant scalars out of the groups."""
    from quantized_vit_tpu.models import init_quant_params_tree

    m = resnet8(quant=QuantConfig(enabled=True))
    params, stats, x = _init(m)
    params = init_quant_params_tree(params, init_bits=8.0)
    found = discover_node_groups(m, params, x, batch_stats=stats,
                                 model_kwargs={"deterministic": True})
    declared = resnet_node_groups(m.cfg, params)

    def kernels_of(groups):
        return {
            tuple(sorted(e.path for e in g.entries
                         if e.path.endswith("kernel")))
            for g in groups
        }

    assert kernels_of(found) == kernels_of(declared)
    for g in found:
        for e in g.entries:
            assert not e.path.rsplit("/", 1)[-1].startswith(
                ("d_quant", "q_m", "t_quant")) or \
                e.transform == Transform.NO_PRUNE


def test_vit_discovery_is_conservative():
    """Attention is a composed op (declarative builders); discovery must
    never mark attention-coupled tensors prunable, while the per-block MLP
    hidden group — a basic pattern — is still found prunable."""
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=48, depth=1,
                    num_heads=2, num_classes=5)
    m = VisionTransformer(cfg)
    params, _, x = _init(m)
    found = discover_node_groups(m, params, x)
    by_kernel = {}
    for g in found:
        for e in g.entries:
            by_kernel[e.path] = g
    assert not by_kernel["blocks_0/attn/qkv/kernel"].is_prunable
    assert not by_kernel["patch_embed/proj/kernel"].is_prunable
    assert not by_kernel["head/kernel"].is_prunable
    fc1 = by_kernel["blocks_0/mlp/fc1/kernel"]
    assert fc1.is_prunable and fc1.num_groups == 192


def test_discovered_groups_drive_hesso():
    """Discovered groups are drop-in for the optimizers: HESSO reaches its
    sparsity target on a MobileNet with zero declarations."""
    from quantized_vit_tpu.opt import HESSO, HESSOConfig

    m = mobilenet_small()
    params, stats, x = _init(m)
    groups = discover_node_groups(m, params, x, batch_stats=stats,
                                  model_kwargs={"deterministic": True})
    opt = HESSO(groups, params, HESSOConfig(
        lr=1e-2, target_group_sparsity=0.3,
        start_pruning_step=2, pruning_steps=6, pruning_periods=2))

    def loss_fn(p):
        y = m.apply({"params": p, "batch_stats": stats}, x,
                    deterministic=True)
        return jnp.mean(jnp.square(y))

    p = params
    for _ in range(12):
        p = opt.step(p, jax.grad(loss_fn)(p))
    # whole channel groups went to zero, incl. the merged depthwise kernels
    zeroed = 0
    for g in groups:
        if not g.is_prunable:
            continue
        from quantized_vit_tpu.opt.groups import group_sq_norms

        norms = np.asarray(group_sq_norms(g, p))
        zeroed += int((norms == 0).sum())
    assert zeroed > 0


def test_oto_facade_auto_discovery_on_custom_model():
    """OTO(model, params, example_input=...) works for a model with NO
    registered family: discovery (incl. residual merge), generic
    trace-based cost metrics, and HESSO — zero declarations."""
    import flax.linen as nn

    from quantized_vit_tpu.graph import OTO
    from quantized_vit_tpu.opt.groups import group_sq_norms

    class CustomNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(12, (3, 3), name="c1")(x)
            x = nn.relu(x)
            skip = x
            x = nn.Conv(12, (3, 3), name="c2")(x)
            x = nn.relu(x + skip)          # residual
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(24, name="d1")(x)
            x = nn.tanh(x)
            return nn.Dense(4, name="out")(x)

    m = CustomNet()
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), x)["params"])
    oto = OTO(m, params, example_input=x)

    by_kernel = {e.path: g for g in oto.node_groups for e in g.entries}
    # residual merged c1 and c2 into one group
    assert by_kernel["c1/kernel"] is by_kernel["c2/kernel"]
    assert by_kernel["d1/kernel"].is_prunable
    assert not by_kernel["out/kernel"].is_prunable

    # generic trace-based cost model: exact analytic MACs
    # c1 16*16*9*3*12 + c2 16*16*9*12*12 + d1 12*24 + out 24*4
    assert oto.compute_macs(params) == 82944 + 331776 + 288 + 96
    assert oto.compute_num_params(params) == 2056
    assert oto.compute_average_bit_width(params) == pytest.approx(32.0)

    opt = oto.hesso(lr=1e-2, target_group_sparsity=0.25,
                    start_pruning_step=2, pruning_steps=6,
                    pruning_periods=2)
    p = params
    for _ in range(10):
        g = jax.grad(
            lambda q: jnp.mean(jnp.square(m.apply({"params": q}, x))))(p)
        p = opt.step(p, g)
    zeroed = sum(int((np.asarray(group_sq_norms(g, p)) == 0).sum())
                 for g in oto.node_groups if g.is_prunable)
    assert zeroed > 0

    # generic physical compression: sliced params + width report, and the
    # compressed forward equals the zeroed-full forward
    new_params, shapes = oto.construct_subnet(p)
    d1_w = shapes["d1"][-1]
    conv_w = shapes["c2"][-1]

    class Rebuilt(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(conv_w, (3, 3), name="c1")(x)
            x = nn.relu(x)
            skip = x
            x = nn.Conv(conv_w, (3, 3), name="c2")(x)
            x = nn.relu(x + skip)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(d1_w, name="d1")(x)
            x = nn.tanh(x)
            return nn.Dense(4, name="out")(x)

    xr = jnp.array(np.random.default_rng(3).standard_normal((2, 16, 16, 3)),
                   jnp.float32)
    y_sparse = m.apply({"params": p}, xr)
    y_slim = Rebuilt().apply({"params": new_params}, xr)
    np.testing.assert_allclose(np.asarray(y_slim), np.asarray(y_sparse),
                               rtol=1e-5, atol=1e-5)


def test_auto_discovery_records_dataflow_edges():
    """discover_node_groups(return_edges=True) reports stem->stem data
    dependencies between merged groups; OTO.visualize renders them."""
    import flax.linen as nn

    from quantized_vit_tpu.graph import OTO

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), name="a")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(16, name="b")(x)
            return nn.Dense(4, name="c")(nn.tanh(x))

    m = Net()
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), x)["params"])
    oto = OTO(m, params, example_input=x)
    assert oto.group_edges == [("a", "b"), ("b", "c")]
    dot = oto.visualize()
    assert '"a" -> "b";' in dot and '"b" -> "c";' in dot


def test_unprunable_survives_late_union_reroot():
    """Regression: unprunable was recorded as a union-find ROOT at marking
    time; a later merge re-rooted the group and silently dropped the flag.
    A stem whose output is a model output must stay unprunable even when
    its group merges with a lower-index stem afterwards."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            y0 = nn.relu(nn.Dense(8, name="c0")(x))
            y1 = nn.relu(nn.Dense(8, name="c1")(x))
            aux = jnp.tanh(y1)           # c1's output IS a model output
            merged = nn.relu(y0 + y1)    # ...and c1 merges with c0
            return merged, aux

    m = Net()
    x = jnp.zeros((2, 4), jnp.float32)
    params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), x)["params"])
    groups = discover_node_groups(m, params, x)
    by_kernel = {e.path: g for g in groups for e in g.entries}
    g = by_kernel["c1/kernel"]
    assert by_kernel["c0/kernel"] is g  # residual-style merge happened
    assert not g.is_prunable            # output adjacency survived it


def test_one_channel_input_conv_is_not_depthwise():
    """Regression: a regular conv on 1-channel input has kernel
    [k, k, 1, C] just like a depthwise conv; only feature_group_count
    distinguishes them. The grayscale stem must form its OWN group with its
    BN accessories attached."""
    import flax.linen as nn

    class GrayNet(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            x = nn.Conv(16, (3, 3), use_bias=False, name="c0")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             name="bn0")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(4, name="head")(x)

    m = GrayNet()
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)  # GRAYSCALE input
    v = m.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(v["params"])
    stats = flax.core.unfreeze(v["batch_stats"])
    groups = discover_node_groups(m, params, x, batch_stats=stats,
                                  model_kwargs={"deterministic": True})
    by_kernel = {e.path: g for g in groups for e in g.entries}
    g = by_kernel["c0/kernel"]
    assert g.is_prunable and g.num_groups == 16
    paths = {e.path for e in g.entries}
    assert "bn0/scale" in paths and "bn0/bias" in paths  # accessories found
