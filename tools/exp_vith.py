"""ViT-H/14 kernel decomposition + tiling experiments (VERDICT r3 #3).

ViT-H serves at 43.4% int8-roofline MFU vs ViT-B/L's ~72-74%
(docs/PERFORMANCE.md). Structural suspects: (a) M = 8*288 = 2304 rows
divides NO fast M-tile (bm 896/448 pad to 2688, +17% wasted rows),
(b) head_dim 80 per-head slices are lane-unaligned in the attention
kernels, (c) the whole-attention-branch kernel overflows VMEM at
j_imgs=2 so ViT-H runs the 3-kernel chain.

This tool times each serving kernel at exact ViT-H shapes with tiling
overrides so the fix is chosen on measurements, not theory. Chain-timed
(bench.py poke method). Run on the chip:  python tools/exp_vith.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 200  # single kernels are 50-350 us; the chain must dwarf the
REPS = 3     # ~25-29 ms RPC floor's +-2 ms jitter

B, N, D, H, HD = 8, 288, 1280, 16, 80
NV = 257
THREE = 3 * H * HD
HID = 4 * D
M = B * N


from _bench_util import timeit


def _timeit(fn, *args):
    return timeit(fn, *args, reps=REPS)


def _chain(step, iters=ITERS):
    @jax.jit
    def chain(x):
        def body(i, carry):
            xx, acc = carry
            y = step(xx)
            s = y.reshape(-1)[0].astype(jnp.float32)
            poke = (s - s + jnp.float32(1)).astype(xx.dtype)
            xx = jax.lax.dynamic_update_slice(
                xx, poke.reshape((1,) * xx.ndim), (0,) * xx.ndim)
            return xx, acc + s
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc
    return chain


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    floor = _timeit(empty, jnp.ones((8,), jnp.float32))
    print(f"floor {floor*1e3:.1f} ms")

    from quantized_vit_tpu.ops import (attention_qkv, attention_qkv_proj,
                                       fused_mlp, fused_quant_matmul)

    x = jnp.array(rng.standard_normal((M, D)) * 0.2, jnp.bfloat16)
    wq = jnp.array(rng.integers(-7, 8, (D, THREE)), jnp.int8)
    bq = jnp.array(rng.standard_normal(THREE) * 0.01, jnp.float32)
    g = jnp.array(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    be = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    kw = dict(fmt="int8", prologue="ln_quant", act_d=jnp.float32(0.05),
              act_t=jnp.float32(1.0), act_top=127, ln_scale=g, ln_bias=be,
              out_dtype=jnp.bfloat16)

    # --- qkv matmul: default bm vs 288-family tiles --------------------
    for bm in (None, 576, 288):
        try:
            fn = _chain(lambda xx, bm=bm: fused_quant_matmul(
                xx, wq, jnp.float32(1e-3), bq, block_m=bm, **kw))
            dt = (_timeit(fn, x) - floor) / ITERS
            ideal = 2 * M * D * THREE / 394e12
            print(f"qkv  M={M} bm={bm}: {dt*1e6:7.1f} us  "
                  f"(ideal {ideal*1e6:.1f}, {ideal/dt*100:.0f}%)",
                  flush=True)
        except Exception as e:
            print(f"qkv bm={bm}: FAILED {type(e).__name__} {str(e)[:80]}")

    # --- fused MLP: default bm (VMEM forces tiny tiles at D=1280) ------
    w1 = jnp.array(rng.integers(-7, 8, (D, HID)), jnp.int8)
    w2 = jnp.array(rng.integers(-7, 8, (HID, D)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(HID) * 0.01, jnp.float32)
    b2 = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    mkw = dict(ln_scale=g, ln_bias=be, act_d=jnp.float32(0.05),
               act_t=jnp.float32(1.0), act_top=127,
               hid_d=jnp.float32(0.05), hid_t=jnp.float32(1.0),
               hid_top=127, fmt="int8", out_dtype=jnp.bfloat16)
    ideal_mlp = 2 * 2 * M * D * HID / 394e12
    for bm in (None, 128, 64):
        try:
            fn = _chain(lambda xx, bm=bm: fused_mlp(
                xx, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2,
                block_m=bm, **mkw))
            dt = (_timeit(fn, x) - floor) / ITERS
            print(f"mlp  M={M} bm={bm}: {dt*1e6:7.1f} us  "
                  f"(ideal {ideal_mlp*1e6:.1f}, {ideal_mlp/dt*100:.0f}%)",
                  flush=True)
        except Exception as e:
            print(f"mlp bm={bm}: FAILED {type(e).__name__} {str(e)[:80]}")

    # --- MLP as the two-kernel chain (one weight resident per kernel) --
    hid_d = jnp.float32(0.05)
    for bm in (None, 576, 288):
        try:
            def two_kernel(xx, bm=bm):
                hlv = fused_quant_matmul(
                    xx, w1, jnp.float32(1e-3), b1, block_m=bm,
                    fmt="int8", prologue="ln_quant",
                    act_d=jnp.float32(0.05), act_t=jnp.float32(1.0),
                    act_top=127, ln_scale=g, ln_bias=be,
                    epilogue="gelu_quant", out_d=hid_d,
                    out_t=jnp.float32(1.0), out_top=127)
                return fused_quant_matmul(
                    hlv, w2, jnp.float32(1e-3), b2, block_m=bm,
                    fmt="int8", prologue=None, epilogue="residual",
                    residual=xx)
            fn = _chain(two_kernel)
            dt = (_timeit(fn, x) - floor) / ITERS
            print(f"mlp2 M={M} bm={bm}: {dt*1e6:7.1f} us  "
                  f"(ideal {ideal_mlp*1e6:.1f}, {ideal_mlp/dt*100:.0f}%)",
                  flush=True)
        except Exception as e:
            print(f"mlp2 bm={bm}: FAILED {type(e).__name__} {str(e)[:80]}")

    # --- attention: qkv-layout kernel at hd=80 -------------------------
    qkv = jnp.array(rng.standard_normal((B, N, THREE)) * 0.1, jnp.bfloat16)
    akw = dict(heads=H, sm_scale=HD**-0.5, n_valid=NV,
               out_d=jnp.float32(0.05), out_t=jnp.float32(1.0), out_top=127)
    fn = _chain(lambda q: attention_qkv(q, **akw))
    dt = (_timeit(fn, qkv) - floor) / ITERS
    nk = 272
    ideal = 2 * B * H * N * nk * HD * 2 / 197e12
    print(f"attn_qkv hd80: {dt*1e6:7.1f} us (bf16 ideal {ideal*1e6:.1f}, "
          f"{ideal/dt*100:.0f}%)")

    # --- attention + proj fused ----------------------------------------
    wp = jnp.array(rng.integers(-7, 8, (H * HD, D)), jnp.int8)
    bp = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    res = jnp.array(rng.standard_normal((B, N, D)) * 0.1, jnp.bfloat16)
    fn = _chain(lambda q: attention_qkv_proj(
        q, wp, jnp.float32(1e-3), bp, res, fmt="int8", **akw))
    dt = (_timeit(fn, qkv) - floor) / ITERS
    ideal = (2 * B * H * N * nk * HD * 2 / 197e12
             + 2 * M * H * HD * D / 394e12)
    print(f"attn+proj:    {dt*1e6:7.1f} us (ideal {ideal*1e6:.1f}, "
          f"{ideal/dt*100:.0f}%)")

    # --- whole block kernel, j_imgs=1 (VMEM-feasible variant) ----------
    from quantized_vit_tpu.ops import attention_block

    xb = jnp.array(rng.standard_normal((B, N, D)) * 0.2, jnp.bfloat16)
    try:
        fn = _chain(lambda xx: attention_block(
            xx, wq, jnp.float32(1e-3), bq, wp, jnp.float32(1e-3), bp,
            ln_scale=g, ln_bias=be, heads=H, sm_scale=HD**-0.5, n_valid=NV,
            act_d=jnp.float32(0.05), act_t=jnp.float32(1.0), act_top=127,
            out_d=jnp.float32(0.05), out_t=jnp.float32(1.0), out_top=127,
            fmt="int8", out_dtype=jnp.bfloat16))
        dt = (_timeit(fn, xb) - floor) / ITERS
        ideal = (2 * M * D * THREE / 394e12
                 + 2 * B * H * N * nk * HD * 2 / 197e12
                 + 2 * M * H * HD * D / 394e12)
        print(f"attn_block:   {dt*1e6:7.1f} us (ideal {ideal*1e6:.1f}, "
              f"{ideal/dt*100:.0f}%)")
    except Exception as e:
        print(f"attn_block: FAILED ({type(e).__name__}: {str(e)[:120]})")

    # --- full forward reference ----------------------------------------
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (random_vit_int4_artifact,
                                         vit_int4_forward)
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    cfg = ViTConfig(num_classes=1000, embed_dim=D, depth=32, num_heads=H,
                    patch_size=14)
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    imgs = rng.standard_normal((B, 224, 224, 3)).astype(np.float32)
    imgs_p = jnp.asarray(patchify_batch(imgs, 14))

    # artifact as ARGUMENT, never a closure constant: a closed-over
    # artifact is inlined as MLIR literals (1.27 GB at ViT-H) and
    # overflows the remote-compile request limit (docs/KERNELS.md #8)
    @jax.jit
    def full_chain(a, xx):
        def body(i, carry):
            z, acc = carry
            y = vit_int4_forward(a, z, cfg, float_dtype=jnp.bfloat16,
                                 images_layout="patches")
            s = y.reshape(-1)[0].astype(jnp.float32)
            poke = (s - s + jnp.float32(1)).astype(z.dtype)
            z = jax.lax.dynamic_update_slice(
                z, poke.reshape((1,) * z.ndim), (0,) * z.ndim)
            return z, acc + s
        _, acc = jax.lax.fori_loop(0, 20, body, (xx, jnp.float32(0)))
        return acc

    dt = (_timeit(full_chain, art, imgs_p) - floor) / 20
    print(f"full fwd b{B}: {dt*1e3:7.3f} ms ({B/dt:.0f} img/s)")


if __name__ == "__main__":
    main()
