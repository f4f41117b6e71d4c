"""Gen-2 fused kernels vs their XLA mirrors (interpret mode, exact parity).

fused_quant_matmul prologues (quant / ln_quant) and epilogues (residual /
quant / gelu_quant) and attention_qkv must match the pure-XLA mirrors
bit-for-bit — both sides share the same f32 level math (ops/fused.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import (
    attention_qkv,
    attention_qkv_xla,
    fused_quant_matmul,
    fused_quant_matmul_xla,
)
from quantized_vit_tpu.ops.fused import _erf_f32
from quantized_vit_tpu.quant import pack_int4

M, K, N = 48, 64, 96


def _mk(seed=0, fmt="int4"):
    rng = np.random.default_rng(seed)
    x = jnp.array(rng.standard_normal((M, K)).astype(np.float32))
    w_lv = rng.integers(-7, 8, (K, N)).astype(np.int8)
    w = pack_int4(jnp.array(w_lv), axis=0) if fmt == "int4" else jnp.array(w_lv)
    scale = jnp.array(rng.random(N).astype(np.float32) * 0.01)
    bias = jnp.array(rng.standard_normal(N).astype(np.float32) * 0.1)
    act = dict(act_d=jnp.float32(0.05), act_t=jnp.float32(1.0),
               act_top=jnp.int32(7), act_pow=False)
    return rng, x, w, scale, bias, act


@pytest.mark.parametrize("fmt", ["int4", "int8"])
def test_fused_quant_prologue_matches_xla(fmt):
    _, x, w, scale, bias, act = _mk(fmt=fmt)
    want = fused_quant_matmul_xla(x, w, scale, bias, fmt=fmt,
                                  prologue="quant", **act,
                                  out_dtype=jnp.float32)
    got = fused_quant_matmul(x, w, scale, bias, fmt=fmt, prologue="quant",
                             **act, out_dtype=jnp.float32, interpret=True)
    # integer accumulations agree exactly; the f32 epilogue may fuse
    # multiply-add differently between the two lowerings
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_ln_quant_prologue_matches_xla():
    rng, x, w, scale, bias, act = _mk(seed=1)
    g = jnp.array(rng.standard_normal(K).astype(np.float32) * 0.1 + 1.0)
    b = jnp.array(rng.standard_normal(K).astype(np.float32) * 0.1)
    kw = dict(fmt="int4", prologue="ln_quant", ln_scale=g, ln_bias=b,
              out_dtype=jnp.float32, **act)
    want = fused_quant_matmul_xla(x, w, scale, bias, **kw)
    got = fused_quant_matmul(x, w, scale, bias, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_ln_matches_flax_layernorm():
    """The in-kernel LayerNorm (fast-variance) must track flax's LayerNorm:
    feed identity quantization so the only transform is LN + matmul."""
    import flax.linen as nn

    rng, x, w, scale, bias, act = _mk(seed=2)
    g = jnp.array(rng.standard_normal(K).astype(np.float32) * 0.1 + 1.0)
    b = jnp.array(rng.standard_normal(K).astype(np.float32) * 0.1)
    ln = nn.LayerNorm(epsilon=1e-6)
    y_flax = ln.apply({"params": {"scale": g, "bias": b}}, x)
    from quantized_vit_tpu.ops.fused import _layernorm_f32

    y_mine = _layernorm_f32(x, g, b, 1e-6)
    np.testing.assert_allclose(np.asarray(y_mine), np.asarray(y_flax),
                               rtol=1e-5, atol=1e-5)


def test_fused_residual_epilogue():
    rng, x, w, scale, bias, act = _mk(seed=3)
    x_lv = jnp.array(rng.integers(-7, 8, (M, K)), jnp.int8)
    res = jnp.array(rng.standard_normal((M, N)).astype(np.float32))
    kw = dict(fmt="int4", prologue=None, epilogue="residual", residual=res,
              out_dtype=jnp.float32)
    want = fused_quant_matmul_xla(x_lv, w, scale, bias, **kw)
    got = fused_quant_matmul(x_lv, w, scale, bias, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("epi", ["quant", "gelu_quant"])
def test_fused_int8_emitting_epilogues(epi):
    _, x, w, scale, bias, act = _mk(seed=4)
    kw = dict(fmt="int4", prologue="quant", **act, epilogue=epi,
              out_d=jnp.float32(0.02), out_t=jnp.float32(1.0),
              out_top=jnp.int32(127), out_pow=False)
    want = fused_quant_matmul_xla(x, w, scale, bias, **kw)
    got = fused_quant_matmul(x, w, scale, bias, interpret=True, **kw)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_nonlinear_act_pow():
    """t != 1 power-map quantization in the prologue."""
    _, x, w, scale, bias, _ = _mk(seed=5)
    act = dict(act_d=jnp.float32(0.05), act_t=jnp.float32(1.3),
               act_top=jnp.int32(31), act_pow=True)
    kw = dict(fmt="int4", prologue="quant", **act, out_dtype=jnp.float32)
    want = fused_quant_matmul_xla(x, w, scale, bias, **kw)
    got = fused_quant_matmul(x, w, scale, bias, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_unaligned_k_padding():
    """K not a multiple of 256: zero padding must be a no-op, including for
    LayerNorm statistics (real-K divisor)."""
    rng = np.random.default_rng(6)
    k = 40
    x = jnp.array(rng.standard_normal((16, k)).astype(np.float32))
    w_lv = rng.integers(-7, 8, (k, 32)).astype(np.int8)
    w = pack_int4(jnp.array(w_lv), axis=0)
    g = jnp.array(rng.standard_normal(k).astype(np.float32) * 0.1 + 1.0)
    b = jnp.array(rng.standard_normal(k).astype(np.float32) * 0.1)
    kw = dict(fmt="int4", prologue="ln_quant", ln_scale=g, ln_bias=b,
              act_d=jnp.float32(0.05), act_t=jnp.float32(1.0),
              act_top=jnp.int32(7), act_pow=False, out_dtype=jnp.float32)
    want = fused_quant_matmul_xla(x, w, jnp.float32(0.01), None, **kw)
    got = fused_quant_matmul(x, w, jnp.float32(0.01), None, interpret=True,
                             **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_erf_poly_accuracy():
    """The division/exp-free erf polynomial is an |y|-WEIGHTED fit: the GELU
    epilogue multiplies the erf error by ~|y|/2, so the fit equalizes
    |y|*err instead of err. Raw erf error is up to 1.3e-2 (near the clamp
    boundary, where |y| is large enough that GELU output is quantized
    coarsely anyway) but the composite GELU error stays <= 5e-3 — below
    half a quantization step (d/2 >= 1e-2 for practical learned step
    sizes). The polynomial is deliberately short: each coefficient costs
    ~10us of VPU time per fc1 call at ViT-B batch-32 serving shapes
    (ops/fused.py:_ERF_COEFS)."""
    from scipy.special import erf as serf

    u = np.linspace(-8.0, 8.0, 100001).astype(np.float32)
    mine = np.asarray(_erf_f32(jnp.array(u)))
    np.testing.assert_allclose(mine, serf(u.astype(np.float64)), atol=1.4e-2)
    # GELU composite error bound (gelu(y) for y = sqrt(2)*u). The fit is
    # constrained to poly(3) == 1 so the tail needs no output clamp.
    y = np.sqrt(2.0) * u.astype(np.float64)
    gelu_mine = y * 0.5 * (1.0 + mine)
    gelu_true = y * 0.5 * (1.0 + serf(u.astype(np.float64)))
    np.testing.assert_allclose(gelu_mine, gelu_true, atol=7e-3)


def test_attention_qkv_matches_xla_and_reference_math():
    rng = np.random.default_rng(7)
    b, n, heads, hd = 2, 32, 4, 16
    n_valid = 27
    qkv = jnp.array(
        rng.standard_normal((b, n, 3 * heads * hd)).astype(np.float32))
    kw = dict(heads=heads, sm_scale=hd**-0.5, n_valid=n_valid,
              out_dtype=jnp.float32)
    want = attention_qkv_xla(qkv, **kw)
    got = attention_qkv(qkv, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # against the straightforward per-head einsum on the REAL tokens
    x = np.asarray(qkv)[:, :n_valid].reshape(b, n_valid, 3, heads, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    s = np.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", p, v).reshape(b, n_valid, heads * hd)
    np.testing.assert_allclose(np.asarray(got)[:, :n_valid], o,
                               rtol=1e-5, atol=1e-5)


def test_attention_qkv_quantized_output():
    rng = np.random.default_rng(8)
    b, n, heads, hd = 2, 16, 2, 8
    qkv = jnp.array(
        rng.standard_normal((b, n, 3 * heads * hd)).astype(np.float32))
    kw = dict(heads=heads, sm_scale=hd**-0.5, n_valid=n,
              out_d=jnp.float32(0.01), out_t=jnp.float32(1.0),
              out_top=jnp.int32(127), out_pow=False)
    want = attention_qkv_xla(qkv, **kw)
    got = attention_qkv(qkv, interpret=True, **kw)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_qkv_int8_matches_xla_and_tracks_float():
    """INT8 attention (dynamic per-head scales): kernel == XLA mirror
    bit-for-bit; and the int8 path stays close to the float path."""
    rng = np.random.default_rng(9)
    b, n, heads, hd = 2, 32, 4, 16
    qkv = jnp.array(
        rng.standard_normal((b, n, 3 * heads * hd)).astype(np.float32))
    kw = dict(heads=heads, sm_scale=hd**-0.5, n_valid=27,
              out_dtype=jnp.float32)
    want = attention_qkv_xla(qkv, int_attention=True, **kw)
    got = attention_qkv(qkv, int_attention=True, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    f32 = attention_qkv_xla(qkv, int_attention=False, **kw)
    np.testing.assert_allclose(np.asarray(want)[:, :27], np.asarray(f32)[:, :27],
                               atol=0.05)


def test_vit_forward_int_attention_close_to_float_attention():
    """End-to-end: the INT8-attention serving path deviates only by the
    attention quantization error."""
    import flax
    from quantized_vit_tpu.models import (QuantConfig, ViTConfig,
                                          VisionTransformer,
                                          init_quant_params_tree)
    from quantized_vit_tpu.serve import export_vit_int4, vit_int4_forward

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=4, num_classes=10,
                    quant=QuantConfig(enabled=True))
    model = VisionTransformer(cfg)
    x = jnp.array(np.random.default_rng(3).standard_normal((2, 32, 32, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), x)["params"])
    params = init_quant_params_tree(params, init_bits=4.0)
    art = export_vit_int4(cfg, params)
    y_f = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False))
    y_i = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False,
                                      int_attention=True))
    # the int8 attention error is often absorbed entirely by the downstream
    # int4 activation quantization (W4A4: only ~15 levels) — identical
    # outputs are expected at 4 bits; just bound the deviation
    np.testing.assert_allclose(y_i, y_f, rtol=0.08, atol=0.08)


def test_fused_mlp_chunked_matches_resident_and_xla():
    """Hidden-chunked fused_mlp (the big-weight streaming path, ViT-H
    routing — tools/exp_vith.py) is bit-identical to the resident kernel
    and the XLA mirror: int32 hidden accumulation is exact under any
    chunking."""
    from quantized_vit_tpu.ops import fused_mlp, fused_mlp_xla

    rng = np.random.default_rng(3)
    k, hid, m = 128, 512, 96
    x = jnp.array(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
    w1 = jnp.array(rng.integers(-7, 8, (k, hid)), jnp.int8)
    w2 = jnp.array(rng.integers(-7, 8, (hid, k)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(hid) * 0.01, jnp.float32)
    b2 = jnp.array(rng.standard_normal(k) * 0.01, jnp.float32)
    kw = dict(ln_scale=jnp.array(rng.standard_normal(k) * 0.1 + 1.0,
                                 jnp.float32),
              ln_bias=jnp.array(rng.standard_normal(k) * 0.01, jnp.float32),
              act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
              hid_d=jnp.float32(0.05), hid_t=jnp.float32(1.0), hid_top=127,
              fmt="int8", out_dtype=jnp.bfloat16)
    want = np.asarray(fused_mlp_xla(
        x, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2, **kw),
        np.float32)
    for hb in (256, 128):
        got = np.asarray(fused_mlp(
            x, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2,
            hid_block=hb, interpret=True, **kw), np.float32)
        np.testing.assert_array_equal(got, want)
    # pow-map (t != 1) quantizers through the chunked path
    kw2 = dict(kw, act_t=jnp.float32(1.08), hid_t=jnp.float32(0.93))
    want2 = np.asarray(fused_mlp_xla(
        x, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2,
        act_pow=True, hid_pow=True, **kw2), np.float32)
    got2 = np.asarray(fused_mlp(
        x, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2,
        hid_block=256, interpret=True, act_pow=True, hid_pow=True, **kw2),
        np.float32)
    np.testing.assert_array_equal(got2, want2)


def test_fused_mlp_resident_matches_xla():
    """The RESIDENT-weight fused_mlp (no hidden chunking) against the XLA
    mirror, in both formats. Regression: since the ViT-H auto-chunk
    routing (bm<224 -> chunked), small-M int8 calls silently take the
    chunked path, so without forcing the resident path the suite never
    executes the resident kernel body (a NameError there once went
    unnoticed). m=448 keeps int8 resident; int4 never auto-chunks."""
    from quantized_vit_tpu.ops import fused_mlp, fused_mlp_xla

    rng = np.random.default_rng(7)
    for fmt, m, k, hid in (("int8", 448, 128, 512), ("int4", 96, 256, 512)):
        x = jnp.array(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
        w1v = jnp.array(rng.integers(-7, 8, (k, hid)), jnp.int8)
        w2v = jnp.array(rng.integers(-7, 8, (hid, k)), jnp.int8)
        w1 = pack_int4(w1v, axis=0) if fmt == "int4" else w1v
        w2 = pack_int4(w2v, axis=0) if fmt == "int4" else w2v
        kw = dict(ln_scale=jnp.array(rng.standard_normal(k) * 0.1 + 1.0,
                                     jnp.float32),
                  ln_bias=jnp.array(rng.standard_normal(k) * 0.01,
                                    jnp.float32),
                  act_d=jnp.float32(0.05), act_t=jnp.float32(1.0),
                  act_top=127, hid_d=jnp.float32(0.05),
                  hid_t=jnp.float32(1.0), hid_top=127,
                  fmt=fmt, out_dtype=jnp.bfloat16)
        want = np.asarray(fused_mlp_xla(
            x, w1, jnp.float32(1e-3), None, w2, jnp.float32(1e-3), None,
            **kw), np.float32)
        got = np.asarray(fused_mlp(
            x, w1, jnp.float32(1e-3), None, w2, jnp.float32(1e-3), None,
            interpret=True, **kw), np.float32)
        # near-exact: with RANDOM quantizer constants a handful of GELU
        # outputs land on a round() knife edge where the kernel's folded
        # 2^-0.5 scaling and the mirror's unfolded order differ by one
        # f32 ulp -> one hidden level (~3/57k elements, <=scale2*|w2| per
        # output). Real-artifact exactness is pinned on chip by the bench
        # preamble.
        np.testing.assert_allclose(got, want, rtol=0, atol=0.02)


def test_fused_mlp_chunked_rejects_int4():
    """int4 packing pairs hidden rows across the H/2 boundary; a
    contiguous w2 row-chunk would mix nibble planes."""
    from quantized_vit_tpu.ops import fused_mlp

    rng = np.random.default_rng(0)
    k, hid = 256, 512
    w1 = pack_int4(jnp.array(rng.integers(-7, 8, (k, hid)), jnp.int8), axis=0)
    w2 = pack_int4(jnp.array(rng.integers(-7, 8, (hid, k)), jnp.int8), axis=0)
    with pytest.raises(ValueError, match="int8"):
        fused_mlp(jnp.zeros((32, k), jnp.bfloat16),
                  w1, jnp.float32(1e-3), None, w2, jnp.float32(1e-3), None,
                  ln_scale=jnp.ones(k), ln_bias=jnp.zeros(k),
                  act_d=jnp.float32(0.05), act_top=127,
                  hid_d=jnp.float32(0.05), hid_top=127,
                  fmt="int4", hid_block=256, interpret=True)


def test_fused_rejects_bad_args():
    _, x, w, scale, bias, act = _mk()
    with pytest.raises(ValueError):
        fused_quant_matmul(x, w, scale, fmt="int4", prologue="ln_quant",
                           **act, interpret=True)
    with pytest.raises(TypeError):
        fused_quant_matmul(x, w, scale, fmt="int4", prologue=None,
                           interpret=True)
    with pytest.raises(ValueError):
        fused_quant_matmul(x, w, scale, fmt="int4", prologue="quant", **act,
                           epilogue="residual", interpret=True)
