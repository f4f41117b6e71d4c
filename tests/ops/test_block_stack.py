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


def test_block_stack_kernel_j2_matches_j1_pair():
    """The j_imgs generalization (round 5): two images through one
    megakernel call must equal two independent j=1 calls — the per-image
    attention task loop must not mix rows across images. (On v5e the
    b=2 serving route is a measured VMEM dead end at ViT-B dims — this
    guards the kernel's correctness at dims where it does fit.)"""
    from quantized_vit_tpu.ops.block_stack import vit_block_stack

    cfg = _cfg()
    art = random_vit_int4_artifact(cfg, seed=2, pack_weights=True)
    lat, meta = prepare_latency_artifact(art, cfg)
    st = lat["stack"]
    n_pad = 32  # num_tokens 5 -> padded 32 (serving layout)
    rng = np.random.default_rng(2)
    x = jnp.array(rng.standard_normal((2 * n_pad, cfg.embed_dim)) * 0.2,
                  jnp.bfloat16)
    kw = dict(heads=meta.heads,
              sm_scale=(cfg.embed_dim // cfg.num_heads) ** -0.5,
              n_valid=cfg.num_tokens, fmt=meta.fmt, act_pow=meta.act_pow,
              out_pow=meta.out_pow, mlp_pow=meta.mlp_pow,
              hid_pow=meta.hid_pow, act_top=meta.act_top,
              out_top=meta.out_top, mlp_top=meta.mlp_top,
              hid_top=meta.hid_top, out_dtype=jnp.bfloat16,
              interpret=True)
    args = (st["wq"], st["qs"], st["qb"], st["l1g"], st["l1b"],
            st["wp"], st["ps"], st["pb"], st["l2g"], st["l2b"],
            st["w1"], st["s1"], st["b1"], st["w2"], st["s2"], st["b2"],
            st["act_d"], st["act_t"], st["out_d"], st["out_t"],
            st["mlp_d"], st["mlp_t"], st["hid_d"], st["hid_t"])
    y2 = np.asarray(vit_block_stack(x, *args, j_imgs=2, **kw), np.float32)
    y0 = np.asarray(vit_block_stack(x[:n_pad], *args, j_imgs=1, **kw),
                    np.float32)
    y1 = np.asarray(vit_block_stack(x[n_pad:], *args, j_imgs=1, **kw),
                    np.float32)
    np.testing.assert_array_equal(y2[:n_pad], y0)
    np.testing.assert_array_equal(y2[n_pad:], y1)
