"""Empirical block_m sweep for the gen-2 fused serving kernels on real TPU.

Measures per-kernel device time (profiler, no RPC noise) for each of the five
serving kernel configurations at the ViT-B/16 batch-8 shapes, across block_m
candidates, plus the attention kernel. Prints a table to pick static tiles.

Usage: python tools/sweep_fused.py [BATCH]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_serving import profile_device_times
from quantized_vit_tpu.ops.fused import fused_quant_matmul
from quantized_vit_tpu.ops.attention import attention_qkv
from quantized_vit_tpu.quant.packing import pack_int4


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pad = 224
    m = batch * n_pad
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    top = jnp.int32(7)

    # (label, K, N, prologue, epilogue, x_dtype)
    cases = [
        ("qkv ", 768, 2304, "ln_quant", None, jnp.bfloat16),
        ("proj", 768, 768, None, "residual", jnp.int8),
        ("fc1 ", 768, 3072, "ln_quant", "gelu_quant", jnp.bfloat16),
        ("fc2 ", 3072, 768, None, "residual", jnp.int8),
    ]
    for label, k, n, pro, epi, xdt in cases:
        if xdt == jnp.int8:
            x = jnp.array(rng.integers(-7, 8, (m, k)), jnp.int8)
        else:
            x = jnp.array(rng.standard_normal((m, k)) * 0.1, xdt)
        w = pack_int4(jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8), axis=0)
        bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
        scale = jnp.float32(1e-3)
        res = jnp.array(rng.standard_normal((m, n)) * 0.1, jnp.bfloat16)
        ideal = 2 * m * k * n / 394e12 * 1e6

        kw = dict(fmt="int4", prologue=pro, out_dtype=jnp.bfloat16)
        if pro is not None:
            kw.update(act_d=d, act_t=t, act_top=top, act_pow=False,
                      ln_scale=jnp.ones((k,), jnp.float32),
                      ln_bias=jnp.zeros((k,), jnp.float32))
        if epi == "residual":
            kw.update(epilogue="residual")
        elif epi == "gelu_quant":
            kw.update(epilogue="gelu_quant", out_d=d, out_t=t, out_top=top,
                      out_pow=False)

        sub = 16 if xdt == jnp.bfloat16 else 32
        cands = [None] + [bm for bm in
                          (104, 128, 208, 224, 256, 416, 448, 832, 896, 1664)
                          if bm % sub == 0]
        results = []
        for bm in cands:
            try:
                args = (x, res) if epi == "residual" else (x,)
                if epi == "residual":
                    f = jax.jit(lambda x, r, bm=bm: fused_quant_matmul(
                        x, w, scale, bias, block_m=bm, residual=r, **kw))
                else:
                    f = jax.jit(lambda x, bm=bm: fused_quant_matmul(
                        x, w, scale, bias, block_m=bm, **kw))
                r = profile_device_times(f, *args, tag=f"sw_{label.strip()}_{bm}")
                tt = r.get("fused_quant_matmul", (float("nan"), 0))[0]
                results.append((bm, tt))
            except Exception as ex:
                results.append((bm, float("nan")))
        row = "  ".join(f"{bm or 'auto'}:{tt:6.1f}" for bm, tt in results)
        print(f"{label} K={k:4d} N={n:4d} ideal={ideal:5.1f}us  {row}")

    # attention
    qkv = jnp.array(rng.standard_normal((batch, n_pad, 3 * 768)) * 0.1,
                    jnp.bfloat16)
    for int_attn in (False, True):
        f = jax.jit(lambda q, ia=int_attn: attention_qkv(
            q, heads=12, sm_scale=0.125, n_valid=197, out_d=d, out_t=t,
            out_top=top, out_pow=False, int_attention=ia))
        r = profile_device_times(f, qkv, tag=f"attn_{int_attn}")
        tt = r.get("attention_qkv", (float("nan"), 0))[0]
        ideal = 2 * batch * 12 * n_pad * n_pad * 64 * 2 / 394e12 * 1e6
        print(f"attn int={int_attn}  ideal={ideal:5.1f}us  {tt:6.1f}us")


if __name__ == "__main__":
    main()
