"""GPipe pipeline parallelism on the 8-device virtual CPU mesh: pipelined
blocks must match the sequential forward exactly."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from quantized_vit_tpu.models import (
    QuantConfig,
    ViTConfig,
    VisionTransformer,
)
from quantized_vit_tpu.parallel import (
    gpipe_blocks,
    stack_block_params,
    unstack_block_params,
    vit_pipeline_forward,
)


def _mesh(n_pipe=4):
    devs = np.array(jax.devices()[:n_pipe])
    return Mesh(devs, ("pipe",))


def _vit(depth=4, quant=False):
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=depth,
                    num_heads=2, num_classes=6,
                    quant=QuantConfig(enabled=quant) if quant
                    else QuantConfig.off())
    model = VisionTransformer(cfg)
    x = jnp.array(np.random.default_rng(0).standard_normal((4, 32, 32, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), x)["params"])
    return cfg, model, params, x


def test_stack_unstack_roundtrip():
    cfg, model, params, x = _vit(depth=4)
    stacked = stack_block_params(params, 4)
    back = unstack_block_params(stacked, 4)
    for i in range(4):
        a = jax.tree.leaves(params[f"blocks_{i}"])
        b = jax.tree.leaves(back[f"blocks_{i}"])
        for u, v in zip(a, b):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


@pytest.mark.parametrize("n_micro", [1, 4])
def test_gpipe_blocks_match_sequential(n_micro):
    from quantized_vit_tpu.models.vit import Block

    cfg, model, params, x = _vit(depth=4)
    mesh = _mesh(4)
    block = Block(cfg, drop_path_rate=0.0)

    h = jnp.array(np.random.default_rng(1).standard_normal(
        (4, cfg.num_tokens, cfg.embed_dim)), jnp.float32)

    # sequential oracle
    want = h
    for i in range(4):
        want = block.apply({"params": params[f"blocks_{i}"]}, want, True)

    stacked = stack_block_params(params, 4)
    h_mb = h.reshape(n_micro, 4 // n_micro, *h.shape[1:])
    got = gpipe_blocks(
        stacked, h_mb,
        lambda bp, z: block.apply({"params": bp}, z, True),
        mesh=mesh)
    got = got.reshape(4, *h.shape[1:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_vit_pipeline_forward_matches_model(quant):
    cfg, model, params, x = _vit(depth=4, quant=quant)
    if quant:
        from quantized_vit_tpu.models import init_quant_params_tree

        params = init_quant_params_tree(params, init_bits=8.0)
    mesh = _mesh(4)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(vit_pipeline_forward(
        model, params, x, mesh=mesh, n_microbatches=2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gpipe_rejects_indivisible_depth():
    cfg, model, params, x = _vit(depth=4)
    mesh = _mesh(3)
    stacked = stack_block_params(params, 4)
    with pytest.raises(ValueError):
        gpipe_blocks(stacked, jnp.zeros((2, 2, cfg.num_tokens,
                                         cfg.embed_dim)),
                     lambda bp, z: z, mesh=mesh)
