"""Headline benchmark: ViT-B/16 W4A4 INT4 serving throughput on one chip.

Prints ONE JSON line:
  {"metric": "vit_b16_w4a4_images_per_sec_chip", "value": N,
   "unit": "images/s", "vs_baseline": R}

vs_baseline = speedup over the bf16 XLA forward of the same model on the
same chip (the reference publishes no numbers — BASELINE.md — so the bf16
forward is the stand-in for the float fake-quant path the reference runs).

Timing method (see .claude/skills/verify/SKILL.md): this environment's TPU
tunnel has a ~26ms RPC floor per dispatch and block_until_ready does not
truly block, so each measurement chains ITERS forwards inside ONE jit with a
data dependency and forces completion via a host scalar read; the RPC floor
is measured with an empty jit and subtracted. The iteration dependency is an
O(1) dynamic_update_slice poke of one input element (a full-array
``imgs + 0`` carry add costs ~47us/iter of HBM traffic at batch 32 and
inflates every variant equally).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# batch 32 is the single-chip throughput sweet spot (batch 8 ~3.7k img/s,
# 32 ~3.9k; flat beyond — the model is MXU-bound, see PROGRESS notes)
BATCH = 32
ITERS = 30
REPS = 3


def _timeit(fn, *args):
    float(fn(*args))  # compile + warm
    float(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def _kernel_parity_check():
    """Compiled-Mosaic vs XLA parity for the two serving kernels, ON CHIP.

    The test suite runs Pallas only under interpret=True (the TPU is
    driver-only — VERDICT r1 weak #5/#8), so a Mosaic lowering regression
    would otherwise surface as silently wrong bench numbers. This preamble
    runs the real compiled kernels at small shapes and asserts exact match
    against the XLA mirrors before any timing happens.
    """
    import numpy as np
    import jax.numpy as jnp

    from quantized_vit_tpu.ops import (attention_qkv, attention_qkv_xla,
                                       fused_quant_matmul,
                                       fused_quant_matmul_xla)
    from quantized_vit_tpu.ops.fused import _quantize_f32
    from quantized_vit_tpu.quant.packing import pack_int4

    rng = np.random.default_rng(7)
    m, k, n = 224, 256, 384
    x = jnp.array(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    w = pack_int4(jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8), axis=0)
    bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
    g = jnp.array(rng.standard_normal(k) * 0.1 + 1.0, jnp.float32)
    b_ = jnp.array(rng.standard_normal(k) * 0.01, jnp.float32)
    kw = dict(fmt="int4", prologue="ln_quant", act_d=jnp.float32(0.05),
              act_t=jnp.float32(1.0), act_top=jnp.int32(7), ln_scale=g,
              ln_bias=b_, epilogue="gelu_quant", out_d=jnp.float32(0.05),
              out_t=jnp.float32(1.0), out_top=jnp.int32(7))
    got = np.asarray(fused_quant_matmul(x, w, jnp.float32(1e-3), bias, **kw))
    want = np.asarray(
        fused_quant_matmul_xla(x, w, jnp.float32(1e-3), bias, **kw))
    # int8 levels; a benign compiler/runtime transcendental ulp change may
    # flip a level at a rounding tie — allow <=1 level at <=0.5% of
    # positions, mirroring the attention check (ADVICE r2 #2)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    if diff.max() > 1 or (diff > 0).mean() > 0.005:
        raise AssertionError(
            f"fused_quant_matmul Mosaic != XLA: max level diff {diff.max()} "
            f"at {(diff > 0).sum()} positions ({(diff > 0).mean():.4%})")

    # packed-int4 weight variant (batch-1/bandwidth serving default):
    # exercises the in-kernel nibble unpack path
    x8 = _quantize_f32(x, jnp.float32(0.05), jnp.float32(1.0), 7, False)
    got_p = np.asarray(fused_quant_matmul(
        x8, w, jnp.float32(1e-3), bias, fmt="int4", prologue=None,
        epilogue="residual", residual=jnp.zeros((m, n), jnp.bfloat16)))
    want_p = np.asarray(fused_quant_matmul_xla(
        x8, w, jnp.float32(1e-3), bias, fmt="int4", prologue=None,
        epilogue="residual", residual=jnp.zeros((m, n), jnp.bfloat16)))
    if not np.array_equal(got_p, want_p):
        raise AssertionError(
            "packed-int4 fused_quant_matmul Mosaic != XLA: "
            f"{np.abs(got_p.astype(np.float32) - want_p.astype(np.float32)).max()}")

    # fused_mlp (whole-MLP-block kernel), both weight formats — the batch-1
    # path runs its packed-int4 variant
    from quantized_vit_tpu.ops import fused_mlp, fused_mlp_xla

    k_m, hid_m = 256, 512
    xm = jnp.array(rng.standard_normal((96, k_m)) * 0.3, jnp.bfloat16)
    w1i = jnp.array(rng.integers(-7, 8, (k_m, hid_m)), jnp.int8)
    w2i = jnp.array(rng.integers(-7, 8, (hid_m, k_m)), jnp.int8)
    mkw = dict(ln_scale=jnp.array(rng.standard_normal(k_m) * 0.1 + 1.0,
                                  jnp.float32),
               ln_bias=jnp.array(rng.standard_normal(k_m) * 0.01,
                                 jnp.float32),
               act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
               hid_d=jnp.float32(0.05), hid_t=jnp.float32(1.0), hid_top=127,
               out_dtype=jnp.bfloat16)
    b1m = jnp.array(rng.standard_normal(hid_m) * 0.01, jnp.float32)
    b2m = jnp.array(rng.standard_normal(k_m) * 0.01, jnp.float32)
    for fmt_m, W1, W2 in (
            ("int8", w1i, w2i),
            ("int4", pack_int4(w1i, axis=0), pack_int4(w2i, axis=0))):
        got_m = np.asarray(fused_mlp(
            xm, W1, jnp.float32(1e-3), b1m, W2, jnp.float32(1e-3), b2m,
            fmt=fmt_m, **mkw), np.float32)
        want_m = np.asarray(fused_mlp_xla(
            xm, w1i, jnp.float32(1e-3), b1m, w2i, jnp.float32(1e-3), b2m,
            fmt="int8", **mkw), np.float32)
        dm = np.abs(got_m - want_m)
        if dm.max() > 1e-5:
            raise AssertionError(
                f"fused_mlp({fmt_m}) Mosaic != XLA: max {dm.max()}")

    # patch_finalize: the entry kernel of the patches-layout serving path
    # (serve/vit_int4.py:_embed_tokens) — a Mosaic regression here would
    # corrupt every headline number silently (VERDICT r2 weak #6)
    from quantized_vit_tpu.ops.patch import patch_finalize

    acc = jnp.array(rng.standard_normal((3, 4, 256)), jnp.float32)
    pos = jnp.array(rng.standard_normal((4, 256)), jnp.float32)
    cls = jnp.array(rng.standard_normal((256,)), jnp.float32)
    got_f = np.asarray(patch_finalize(acc, pos, cls, jnp.float32(0.125),
                                      n_pad=32))
    body = np.asarray(acc) * 0.125 + np.asarray(pos)
    want_f = np.zeros((3, 32, 256), np.float32)
    want_f[:, :4] = body
    want_f[:, 4] = np.asarray(cls)
    want_f = want_f.astype(jnp.bfloat16).reshape(3 * 32, 256)
    if not np.array_equal(got_f, np.asarray(want_f)):
        raise AssertionError("patch_finalize Mosaic != reference layout")

    qkv = jnp.array(rng.standard_normal((2, 64, 3 * 128)) * 0.1, jnp.bfloat16)
    akw = dict(heads=2, sm_scale=0.125, n_valid=50, out_d=jnp.float32(0.05),
               out_t=jnp.float32(1.0), out_top=jnp.int32(7))
    for ia in (False, True):
        got = np.asarray(attention_qkv(qkv, int_attention=ia, **akw))
        want = np.asarray(attention_qkv_xla(qkv, int_attention=ia, **akw))
        # int8 levels; dynamic-quant rounding may flip a level at ties on
        # different units — allow <=1 level at <=0.5% of positions
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        if diff.max() > 1 or (diff > 0).mean() > 0.005:
            raise AssertionError(
                f"attention_qkv(int={ia}) Mosaic != XLA: max {diff.max()}, "
                f"frac {(diff > 0).mean():.4f}")

    # attention+proj fused kernel (the serving block's attention path)
    from quantized_vit_tpu.ops import attention_qkv_proj

    wp = jnp.array(rng.integers(-7, 8, (128, 256)), jnp.int8)
    bp = jnp.array(rng.standard_normal(256) * 0.01, jnp.float32)
    resp = jnp.array(rng.standard_normal((2, 64, 256)) * 0.1, jnp.bfloat16)
    alv_w = np.asarray(attention_qkv_xla(qkv, **akw))
    want_p = np.asarray(fused_quant_matmul_xla(
        jnp.asarray(alv_w.reshape(2 * 64, 128)), wp, jnp.float32(1e-3), bp,
        fmt="int8", prologue=None, epilogue="residual",
        residual=resp.reshape(2 * 64, 256)), np.float32).reshape(2, 64, 256)
    got_p2 = np.asarray(attention_qkv_proj(
        qkv, wp, jnp.float32(1e-3), bp, resp, fmt="int8", **akw),
        np.float32)
    dp_ = np.abs(got_p2 - want_p)
    # an alv level flip at a rounding tie shifts the output by scale*|w|
    if (dp_ > 0.1).any() or (dp_ > 0).mean() > 0.01:
        raise AssertionError(
            f"attention_qkv_proj Mosaic != XLA pair: max {dp_.max()}")

    # whole-attention-branch kernel (the serving block's actual path),
    # both weight formats, vs the equivalent XLA chain
    from quantized_vit_tpu.ops import attention_block

    xab = jnp.array(rng.standard_normal((2, 64, 256)) * 0.2, jnp.bfloat16)
    wqa = jnp.array(rng.integers(-7, 8, (256, 3 * 128)), jnp.int8)
    qba = jnp.array(rng.standard_normal(3 * 128) * 0.01, jnp.float32)
    ga = jnp.array(rng.standard_normal(256) * 0.1 + 1.0, jnp.float32)
    bea = jnp.array(rng.standard_normal(256) * 0.01, jnp.float32)
    wpa = jnp.array(rng.integers(-7, 8, (128, 256)), jnp.int8)
    bkw = dict(ln_scale=ga, ln_bias=bea, heads=2, sm_scale=0.125,
               n_valid=50, act_d=jnp.float32(0.05), act_t=jnp.float32(1.0),
               act_top=127, out_d=jnp.float32(0.05),
               out_t=jnp.float32(1.0), out_top=7)
    qkv_w = fused_quant_matmul_xla(
        xab.reshape(2 * 64, 256), wqa, jnp.float32(1e-3), qba, fmt="int8",
        prologue="ln_quant", act_d=bkw["act_d"], act_t=bkw["act_t"],
        act_top=127, ln_scale=ga, ln_bias=bea, out_dtype=jnp.bfloat16)
    alv_b = attention_qkv_xla(
        qkv_w.reshape(2, 64, 3 * 128), heads=2, sm_scale=0.125, n_valid=50,
        out_d=bkw["out_d"], out_t=bkw["out_t"], out_top=7)
    want_b = np.asarray(fused_quant_matmul_xla(
        alv_b.reshape(2 * 64, 128), wpa, jnp.float32(2e-3), bp, fmt="int8",
        prologue=None, epilogue="residual",
        residual=xab.reshape(2 * 64, 256)), np.float32).reshape(2, 64, 256)
    for fmt_b, WQ, WP in (
            ("int8", wqa, wpa),
            ("int4", pack_int4(wqa, axis=0), pack_int4(wpa, axis=0))):
        got_b = np.asarray(attention_block(
            xab, WQ, jnp.float32(1e-3), qba, WP, jnp.float32(2e-3), bp,
            fmt=fmt_b, **bkw), np.float32)
        db_ = np.abs(got_b - want_b)
        if (db_ > 0.1).any() or (db_ > 0).mean() > 0.01:
            raise AssertionError(
                f"attention_block({fmt_b}) Mosaic != XLA chain: "
                f"max {db_.max()}")


def main():
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (
        random_vit_int4_artifact,
        vit_int4_forward,
    )

    if jax.default_backend() == "tpu":
        _kernel_parity_check()

    cfg = ViTConfig(num_classes=1000)
    # unpacked-int8 weight storage (values are still int4 levels): kills the
    # in-kernel nibble unpack, fc1 -12us/block measured; the packed-int4
    # format stays available for bandwidth-bound (batch-1) serving
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    images = jnp.array(
        np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
        jnp.float32,
    )
    # Serving feeds the host-patchified layout (utils.native_prep
    # patchify_batch — the input pipeline writes those bytes anyway when
    # assembling the batch): the on-device patch relayout costs
    # ~220us/batch however expressed (tools/exp_entry.py). The bf16
    # baseline below keeps NHWC + XLA conv, its best layout.
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    images_p = jnp.asarray(patchify_batch(np.asarray(images), cfg.patch_size))

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    floor = _timeit(empty, jnp.ones((8,), jnp.float32))

    def _poke(imgs, s):
        upd = (s - s + jnp.ones((), jnp.float32)).astype(imgs.dtype)
        return jax.lax.dynamic_update_slice(
            imgs, upd.reshape((1,) * imgs.ndim), (0,) * imgs.ndim)

    @jax.jit
    def int4_chain(images):
        def body(i, carry):
            imgs, acc = carry
            logits = vit_int4_forward(art, imgs, cfg, float_dtype=jnp.bfloat16,
                                      images_layout="patches")
            return (_poke(imgs, logits[0, 0]), acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, ITERS, body, (images, jnp.float32(0)))
        return acc

    dt_int4 = max(( _timeit(int4_chain, images_p) - floor) / ITERS, 1e-9)
    ips_int4 = BATCH / dt_int4

    # Per-kernel decomposition (VERDICT r4 #1: localize future headline
    # regressions automatically): chain-time the two block kernels at the
    # EXACT serving configuration the forward routes to. A regression in
    # the headline with flat per-kernel times is chip-session drift; a
    # per-kernel delta names the kernel.
    kernel_us = {}
    if jax.default_backend() == "tpu":
        from quantized_vit_tpu.ops import attention_block, fused_mlp

        blk = art["blocks"][0]
        n_pad = 208
        x3 = jnp.zeros((BATCH, n_pad, cfg.embed_dim), jnp.bfloat16)
        x2 = jnp.zeros((BATCH * n_pad, cfg.embed_dim), jnp.bfloat16)
        K_ITERS = 300

        def _kchain(step, x0):
            @jax.jit
            def chain(x):
                def body(i, carry):
                    x, acc = carry
                    s = step(x)
                    return (_poke(x, s), acc + s)
                _, acc = jax.lax.fori_loop(0, K_ITERS, body,
                                           (x, jnp.float32(0)))
                return acc
            return max((_timeit(chain, x0) - floor) / K_ITERS, 1e-9)

        qkv_e, proj_e = blk["qkv"], blk["proj"]
        fc1_e, fc2_e = blk["fc1"], blk["fc2"]
        dt = _kchain(lambda x: attention_block(
            x, qkv_e.w, qkv_e.scale, qkv_e.bias,
            proj_e.w, proj_e.scale, proj_e.bias,
            ln_scale=blk["norm1"]["scale"], ln_bias=blk["norm1"]["bias"],
            heads=cfg.num_heads, sm_scale=(cfg.embed_dim
                                           // cfg.num_heads) ** -0.5,
            n_valid=cfg.num_tokens, act_d=qkv_e.act["d"],
            act_t=qkv_e.act["t"], act_top=qkv_e.top, act_pow=qkv_e.act_pow,
            out_d=proj_e.act["d"], out_t=proj_e.act["t"],
            out_top=proj_e.top, out_pow=proj_e.act_pow, fmt=proj_e.fmt,
            out_dtype=jnp.bfloat16)[0, 0, 0].astype(jnp.float32), x3)
        kernel_us["attention_block_us"] = round(dt * 1e6, 1)
        dt = _kchain(lambda x: fused_mlp(
            x, fc1_e.w, fc1_e.scale, fc1_e.bias,
            fc2_e.w, fc2_e.scale, fc2_e.bias, block_m=832,
            ln_scale=blk["norm2"]["scale"], ln_bias=blk["norm2"]["bias"],
            act_d=fc1_e.act["d"], act_t=fc1_e.act["t"], act_top=fc1_e.top,
            act_pow=fc1_e.act_pow, hid_d=fc2_e.act["d"],
            hid_t=fc2_e.act["t"], hid_top=fc2_e.top, hid_pow=fc2_e.act_pow,
            fmt=fc1_e.fmt,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), x2)
        kernel_us["fused_mlp_us"] = round(dt * 1e6, 1)

    # int8-attention variant (VERDICT r1 #2): score/AV matmuls on the int8
    # MXU with dynamic per-head scales
    @jax.jit
    def int4_ia_chain(images):
        def body(i, carry):
            imgs, acc = carry
            logits = vit_int4_forward(art, imgs, cfg,
                                      float_dtype=jnp.bfloat16,
                                      int_attention=True,
                                      images_layout="patches")
            return (_poke(imgs, logits[0, 0]), acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, ITERS, body, (images, jnp.float32(0)))
        return acc

    dt_ia = max((_timeit(int4_ia_chain, images_p) - floor) / ITERS, 1e-9)

    # batch-1 latency serving (VERDICT r2 #4 / r3 #4): packed-int4 through
    # the whole-depth MEGAKERNEL (ops/block_stack.py — one pallas_call for
    # all 12 blocks; ~4 dispatches total instead of ~38, bit-identical to
    # the chain). The artifact is STACKED once here, outside jit.
    # 10x the iterations: a ~0.18 ms body over ITERS=30 is only ~5 ms of
    # device time against the ~25 +- 1 ms RPC floor (20% noise); 300
    # iterations put the signal an order of magnitude above the jitter.
    from quantized_vit_tpu.serve import (prepare_latency_artifact,
                                         vit_int4_forward_latency)

    art_packed = random_vit_int4_artifact(cfg, seed=0, pack_weights=True)
    art_lat, lat_meta = prepare_latency_artifact(art_packed, cfg)
    img1 = images_p[:1]
    ITERS_B1 = 10 * ITERS

    # parity: the megakernel must agree with the serving chain ON CHIP
    _y_mk = np.asarray(vit_int4_forward_latency(
        art_lat, img1, cfg, lat_meta, float_dtype=jnp.bfloat16), np.float32)
    _y_ch = np.asarray(vit_int4_forward(
        art_packed, img1, cfg, float_dtype=jnp.bfloat16,
        images_layout="patches"), np.float32)
    if not np.array_equal(_y_mk, _y_ch):
        raise AssertionError(
            f"batch-1 megakernel != chain: {np.abs(_y_mk - _y_ch).max()}")

    @jax.jit
    def b1_chain(art_lat, images):
        def body(i, carry):
            imgs, acc = carry
            logits = vit_int4_forward_latency(art_lat, imgs, cfg, lat_meta,
                                              float_dtype=jnp.bfloat16)
            return (_poke(imgs, logits[0, 0]), acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, ITERS_B1, body,
                                   (images, jnp.float32(0)))
        return acc

    dt_b1 = max((_timeit(b1_chain, art_lat, img1) - floor) / ITERS_B1, 1e-9)

    # bf16 baseline: same architecture, plain XLA bf16 matmuls
    import flax
    from quantized_vit_tpu.models import QuantConfig, VisionTransformer

    model = VisionTransformer(ViTConfig(num_classes=1000, quant=QuantConfig.off()))
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1])
    )["params"]
    rng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda s: jnp.array(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02, jnp.bfloat16
        ),
        abstract,
    )
    images_bf16 = images.astype(jnp.bfloat16)

    @jax.jit
    def bf16_chain(images):
        def body(i, carry):
            imgs, acc = carry
            logits = model.apply({"params": params}, imgs)
            return (_poke(imgs, logits[0, 0].astype(jnp.float32)),
                    acc + logits[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (images, jnp.float32(0)))
        return acc

    dt_bf16 = max((_timeit(bf16_chain, images_bf16) - floor) / ITERS, 1e-9)
    ips_bf16 = BATCH / dt_bf16

    print(json.dumps({
        "metric": "vit_b16_w4a4_images_per_sec_chip",
        "value": round(ips_int4, 1),
        "unit": "images/s",
        "vs_baseline": round(ips_int4 / ips_bf16, 3),
        "detail": {
            "batch": BATCH,
            "int4_ms_per_batch": round(dt_int4 * 1e3, 3),
            "bf16_ms_per_batch": round(dt_bf16 * 1e3, 3),
            "bf16_images_per_sec": round(ips_bf16, 1),
            "rpc_floor_ms": round(floor * 1e3, 1),
            "images_layout": "patches",
            # int8-attention variant: score/AV on the int8 MXU (accuracy
            # delta vs float attention measured in
            # tests/serve/test_accuracy_e2e.py; see docs/KERNELS.md)
            "int8_attn_images_per_sec": round(BATCH / dt_ia, 1),
            "int8_attn_ms_per_batch": round(dt_ia * 1e3, 3),
            # packed-int4 batch-1 latency through the whole-depth
            # megakernel (ops/block_stack.py — launch overhead eliminated;
            # remaining time is MXU at M=224 + partially-exposed VPU,
            # decomposition in docs/KERNELS.md #4)
            "latency_ms_batch1": round(dt_b1 * 1e3, 3),
            # MFU vs the v5e int8 roofline, MODEL-FLOPs convention (round
            # 5): useful work = the 197 REAL tokens' matmul MACs (pad rows
            # are implementation overhead, not work), attention at its
            # bf16 roofline share. Per image: blocks 197 tok x 7.078M
            # MACs/tok/block x 12 = 16.73G, patch embed 196x768x768 =
            # 0.116G, head 0.77M; attention 2 dots x 12 heads x 197^2 x 64
            # = 0.0596G MACs. NOTE: rounds 1-4 reported a padded-geometry
            # figure (224-token MACs + a 12x-overcounted attention term);
            # under THIS convention r4's 4.863 ms scores 0.567, not the
            # 0.70 recorded in BENCH_r04 (docs/PERFORMANCE.md, round-5
            # accounting).
            "mfu_int8_roofline": round(
                (16.849e9 * 2 * BATCH / 394e12
                 + 0.0596e9 * 2 * BATCH / 197e12) / dt_int4, 3),
            **kernel_us,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
