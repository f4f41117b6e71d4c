"""Fused attention kernels (round 3): interpret-mode parity + routing.

`attention_qkv_proj` (attention + proj + residual) and `attention_block`
(LN + quant + qkv + attention + proj + residual) replace the serving
block's attention chain (serve/vit_int4.py). On-chip bitwise parity is
asserted by the bench preamble before every timing run; these tests pin
the same parity in interpret mode on CPU, across weight formats, odd head
counts, and the t != 1 (pow) quantizers, plus the VMEM-fit routing guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantized_vit_tpu.ops import attention_qkv_xla, fused_quant_matmul_xla
from quantized_vit_tpu.ops.attention import (_attention_block,
                                             _attention_qkv_proj,
                                             attention_block,
                                             attention_block_fits,
                                             attention_qkv_proj)
from quantized_vit_tpu.quant.packing import pack_int4


def _mk(b=2, n=32, heads=2, hd=64, d=128, seed=0):
    rng = np.random.default_rng(seed)
    three = 3 * heads * hd
    return dict(
        rng=rng, b=b, n=n, heads=heads, hd=hd, d=d, three=three,
        x=jnp.array(rng.standard_normal((b, n, d)) * 0.2, jnp.bfloat16),
        wq=jnp.array(rng.integers(-7, 8, (d, three)), jnp.int8),
        qb=jnp.array(rng.standard_normal(three) * 0.01, jnp.float32),
        wp=jnp.array(rng.integers(-7, 8, (heads * hd, d)), jnp.int8),
        pb=jnp.array(rng.standard_normal(d) * 0.01, jnp.float32),
        g=jnp.array(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32),
        be=jnp.array(rng.standard_normal(d) * 0.01, jnp.float32),
    )


def _chain_reference(m, act_pow=False, out_pow=False, nv=29):
    """The exact XLA chain the fused kernels replace."""
    x2 = m["x"].reshape(m["b"] * m["n"], m["d"])
    qkv = fused_quant_matmul_xla(
        x2, m["wq"], jnp.float32(1e-3), m["qb"], fmt="int8",
        prologue="ln_quant", act_d=jnp.float32(0.05),
        act_t=jnp.float32(1.08 if act_pow else 1.0), act_top=127,
        act_pow=act_pow, ln_scale=m["g"], ln_bias=m["be"],
        out_dtype=jnp.bfloat16)
    alv = attention_qkv_xla(
        qkv.reshape(m["b"], m["n"], m["three"]), heads=m["heads"],
        sm_scale=0.18, n_valid=nv, out_d=jnp.float32(0.06),
        out_t=jnp.float32(0.93 if out_pow else 1.0), out_top=31,
        out_pow=out_pow)
    out = fused_quant_matmul_xla(
        alv.reshape(m["b"] * m["n"], m["heads"] * m["hd"]), m["wp"],
        jnp.float32(2e-3), m["pb"], fmt="int8", prologue=None,
        epilogue="residual", residual=x2)
    return np.asarray(out, np.float32).reshape(m["b"], m["n"], m["d"]), alv


@pytest.mark.parametrize("fmt", ["int8", "int4"])
def test_attention_qkv_proj_matches_chain(fmt):
    m = _mk()
    want, alv = _chain_reference(m)
    qkv = fused_quant_matmul_xla(
        m["x"].reshape(m["b"] * m["n"], m["d"]), m["wq"], jnp.float32(1e-3),
        m["qb"], fmt="int8", prologue="ln_quant", act_d=jnp.float32(0.05),
        act_t=jnp.float32(1.0), act_top=127, ln_scale=m["g"],
        ln_bias=m["be"], out_dtype=jnp.bfloat16)
    wp = pack_int4(m["wp"], axis=0) if fmt == "int4" else m["wp"]
    got = np.asarray(_attention_qkv_proj(
        qkv.reshape(m["b"], m["n"], m["three"]), wp, jnp.float32(2e-3),
        m["pb"], m["x"], fmt=fmt, interpret=True, heads=m["heads"],
        sm_scale=0.18, n_valid=29, out_d=jnp.float32(0.06),
        out_t=jnp.float32(1.0), out_top=31), np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fmt", ["int8", "int4"])
@pytest.mark.parametrize("pow_", [False, True])
def test_attention_block_matches_chain(fmt, pow_):
    m = _mk(heads=3, hd=32, d=96)  # odd head count, compressed-subnet case
    want, _ = _chain_reference(m, act_pow=pow_, out_pow=pow_)
    wq = pack_int4(m["wq"], axis=0) if fmt == "int4" else m["wq"]
    wp = pack_int4(m["wp"], axis=0) if fmt == "int4" else m["wp"]
    got = np.asarray(_attention_block(
        m["x"], wq, jnp.float32(1e-3), m["qb"], wp, jnp.float32(2e-3),
        m["pb"], fmt=fmt, interpret=True, ln_scale=m["g"], ln_bias=m["be"],
        heads=m["heads"], sm_scale=0.18, n_valid=29,
        act_d=jnp.float32(0.05),
        act_t=jnp.float32(1.08 if pow_ else 1.0), act_top=127,
        act_pow=pow_, out_d=jnp.float32(0.06),
        out_t=jnp.float32(0.93 if pow_ else 1.0), out_top=31,
        out_pow=pow_), np.float32)
    # summation order identical to the chain -> exact in interpret mode up
    # to fma-contraction ulps on this backend
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_qkv_stripes_override_is_numerics_invariant():
    m = _mk()
    outs = []
    for qs in (None, 1, 3):
        outs.append(np.asarray(_attention_block(
            m["x"], m["wq"], jnp.float32(1e-3), m["qb"], m["wp"],
            jnp.float32(2e-3), m["pb"], fmt="int8", interpret=True,
            qkv_stripes=qs, ln_scale=m["g"], ln_bias=m["be"],
            heads=m["heads"], sm_scale=0.18, n_valid=29,
            act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
            out_d=jnp.float32(0.06), out_t=jnp.float32(1.0), out_top=31),
            np.float32))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_attention_block_f32_matches_f32_chain():
    """float_dtype=f32 (strict-parity config): the qkv scratch must carry
    f32, not a silently-rounding bf16 (ADVICE r3 #2). The chain reference
    here runs entirely in f32 so a bf16 scratch would show up as a level
    flip / logit deviation beyond fma ulps."""
    m = _mk()
    m["x"] = m["x"].astype(jnp.float32)
    x2 = m["x"].reshape(m["b"] * m["n"], m["d"])
    qkv = fused_quant_matmul_xla(
        x2, m["wq"], jnp.float32(1e-3), m["qb"], fmt="int8",
        prologue="ln_quant", act_d=jnp.float32(0.05),
        act_t=jnp.float32(1.0), act_top=127, ln_scale=m["g"],
        ln_bias=m["be"], out_dtype=jnp.float32)
    alv = attention_qkv_xla(
        qkv.reshape(m["b"], m["n"], m["three"]), heads=m["heads"],
        sm_scale=0.18, n_valid=29, out_d=jnp.float32(0.06),
        out_t=jnp.float32(1.0), out_top=31)
    want = np.asarray(fused_quant_matmul_xla(
        alv.reshape(m["b"] * m["n"], m["heads"] * m["hd"]), m["wp"],
        jnp.float32(2e-3), m["pb"], fmt="int8", prologue=None,
        epilogue="residual", residual=x2, out_dtype=jnp.float32),
        np.float32).reshape(m["b"], m["n"], m["d"])
    got = np.asarray(_attention_block(
        m["x"], m["wq"], jnp.float32(1e-3), m["qb"], m["wp"],
        jnp.float32(2e-3), m["pb"], fmt="int8", interpret=True,
        out_dtype=jnp.float32, ln_scale=m["g"], ln_bias=m["be"],
        heads=m["heads"], sm_scale=0.18, n_valid=29,
        act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
        out_d=jnp.float32(0.06), out_t=jnp.float32(1.0), out_top=31),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_stripes_must_divide():
    """A stripe override that does not divide the striped width must raise,
    not silently leave stale VMEM columns (ADVICE r3 #3)."""
    m = _mk()
    with pytest.raises(ValueError, match="stripes"):
        _attention_block(
            m["x"], m["wq"], jnp.float32(1e-3), m["qb"], m["wp"],
            jnp.float32(2e-3), m["pb"], fmt="int8", interpret=True,
            qkv_stripes=5, ln_scale=m["g"], ln_bias=m["be"],
            heads=m["heads"], sm_scale=0.18, n_valid=29,
            act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
            out_d=jnp.float32(0.06), out_t=jnp.float32(1.0), out_top=31)
    from quantized_vit_tpu.ops import fused_mlp

    with pytest.raises(ValueError, match="stripes"):
        fused_mlp(
            jnp.zeros((32, 128), jnp.bfloat16),
            jnp.zeros((128, 384), jnp.int8), jnp.float32(1e-3), None,
            jnp.zeros((384, 128), jnp.int8), jnp.float32(1e-3), None,
            ln_scale=jnp.ones(128), ln_bias=jnp.zeros(128),
            act_d=jnp.float32(0.05), act_top=127,
            hid_d=jnp.float32(0.06), hid_top=31,
            fmt="int8", stripes=5, interpret=True)


def test_guards_and_fit_routing():
    with pytest.raises(ValueError, match="out_top"):
        attention_qkv_proj(jnp.zeros((2, 32, 384), jnp.bfloat16),
                           jnp.zeros((128, 128), jnp.int8),
                           jnp.float32(1e-3), None,
                           jnp.zeros((2, 32, 128), jnp.bfloat16),
                           heads=2, sm_scale=0.1, out_d=jnp.float32(0.05),
                           out_top=0)
    with pytest.raises(ValueError, match="act_top"):
        attention_block(jnp.zeros((2, 32, 128), jnp.bfloat16),
                        jnp.zeros((128, 384), jnp.int8), jnp.float32(1e-3),
                        None, jnp.zeros((128, 128), jnp.int8),
                        jnp.float32(1e-3), None,
                        ln_scale=jnp.ones(128), ln_bias=jnp.zeros(128),
                        heads=2, sm_scale=0.1, act_d=jnp.float32(0.05),
                        act_top=None, out_d=jnp.float32(0.05), out_top=31)
    # VMEM-fit routing (docs/PERFORMANCE.md model-family notes): ViT-B/L
    # take the block kernel, ViT-H falls back to the chain
    assert attention_block_fits(224, 768, 12, 64)
    assert attention_block_fits(224, 1024, 16, 64)
    assert not attention_block_fits(288, 1280, 16, 80)
