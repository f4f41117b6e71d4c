"""Whole-depth batch-1 megakernel (ops/block_stack.py) — interpret-mode
parity vs the serving chain it replaces, both weight formats, plus the
prep-time guards. On-chip bit-parity is asserted by the bench preamble
before every timing run (bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.models.vit import ViTConfig
from quantized_vit_tpu.serve import (prepare_latency_artifact,
                                     random_vit_int4_artifact,
                                     vit_int4_forward,
                                     vit_int4_forward_latency)


def _cfg(depth=3, heads=2):
    return ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=depth,
                     num_heads=heads, num_classes=10)


@pytest.mark.parametrize("packed", [True, False])
def test_megakernel_matches_chain(packed):
    cfg = _cfg()
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=packed)
    lat, meta = prepare_latency_artifact(art, cfg)
    x = jnp.array(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                  jnp.float32)
    ref = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False,
                                      float_dtype=jnp.bfloat16), np.float32)
    got = np.asarray(vit_int4_forward_latency(
        lat, x, cfg, meta, float_dtype=jnp.bfloat16, images_layout="nhwc",
        interpret=True), np.float32)
    np.testing.assert_array_equal(got, ref)


def test_megakernel_f32_residual_matches_chain():
    cfg = _cfg()
    art = random_vit_int4_artifact(cfg, seed=1, pack_weights=True)
    lat, meta = prepare_latency_artifact(art, cfg)
    x = jnp.array(np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
                  jnp.float32)
    ref = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False,
                                      float_dtype=jnp.float32), np.float32)
    got = np.asarray(vit_int4_forward_latency(
        lat, x, cfg, meta, float_dtype=jnp.float32, images_layout="nhwc",
        interpret=True), np.float32)
    np.testing.assert_array_equal(got, ref)


def test_megakernel_guards():
    cfg = _cfg()
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=True)
    lat, meta = prepare_latency_artifact(art, cfg)
    # batch != 1 refused
    with pytest.raises(ValueError, match="batch-1"):
        vit_int4_forward_latency(
            lat, jnp.zeros((2, 32, 32, 3), jnp.float32), cfg, meta,
            images_layout="nhwc", interpret=True)
    # mixed per-block metadata refused at prep
    import dataclasses

    art2 = random_vit_int4_artifact(cfg, seed=0, pack_weights=True)
    art2["blocks"][1] = dict(
        art2["blocks"][1],
        qkv=dataclasses.replace(art2["blocks"][1]["qkv"], top=31))
    with pytest.raises(ValueError, match="uniform"):
        prepare_latency_artifact(art2, cfg)
