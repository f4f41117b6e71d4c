"""Per-layer kernel profiling at the bench batch (32): device time vs
int8-roofline ideal for each serving kernel configuration.

Usage: python tools/profile_b32.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import fused_quant_matmul, attention_qkv
from quantized_vit_tpu.quant.packing import pack_int4
from tools.profile_serving import profile_device_times

B = 32
M = B * 224
PEAK_INT8 = 394e12
PEAK_BF16 = 197e12


def main():
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    top = jnp.int32(7)
    scale = jnp.float32(1e-3)

    def mk(k, n):
        w = pack_int4(jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8), axis=0)
        bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
        return w, bias

    rows = []

    # qkv: ln_quant prologue, bf16 in, bf16 out
    k, n = 768, 2304
    w, bias = mk(k, n)
    x = jnp.array(rng.standard_normal((M, k)) * 0.1, jnp.bfloat16)
    g = jnp.ones((k,), jnp.float32)
    be = jnp.zeros((k,), jnp.float32)
    f = jax.jit(lambda x: fused_quant_matmul(
        x, w, scale, bias, fmt="int4", prologue="ln_quant",
        act_d=d, act_t=t, act_top=top, ln_scale=g, ln_bias=be,
        out_dtype=jnp.bfloat16))
    r = profile_device_times(f, x, tag="qkv32")
    rows.append(("qkv ln_quant", k, n, r.get("fused_quant_matmul", (0, 0))[0]))

    # proj: prologue None (int8 in), residual epilogue
    k, n = 768, 768
    w, bias = mk(k, n)
    xl = jnp.array(rng.integers(-7, 8, (M, k)), jnp.int8)
    res = jnp.array(rng.standard_normal((M, n)) * 0.1, jnp.bfloat16)
    f = jax.jit(lambda x, r_: fused_quant_matmul(
        x, w, scale, bias, fmt="int4", prologue=None, epilogue="residual",
        residual=r_, out_dtype=jnp.bfloat16))
    r = profile_device_times(f, xl, res, tag="proj32")
    rows.append(("proj resid", k, n, r.get("fused_quant_matmul", (0, 0))[0]))

    # fc1: ln_quant prologue + gelu_quant epilogue, int8 out
    k, n = 768, 3072
    w, bias = mk(k, n)
    x = jnp.array(rng.standard_normal((M, k)) * 0.1, jnp.bfloat16)
    f = jax.jit(lambda x: fused_quant_matmul(
        x, w, scale, bias, fmt="int4", prologue="ln_quant",
        act_d=d, act_t=t, act_top=top, ln_scale=g, ln_bias=be,
        epilogue="gelu_quant", out_d=d, out_t=t, out_top=top))
    r = profile_device_times(f, x, tag="fc132")
    rows.append(("fc1 ln+gelu", k, n, r.get("fused_quant_matmul", (0, 0))[0]))

    # fc2: prologue None, residual epilogue
    k, n = 3072, 768
    w, bias = mk(k, n)
    xl = jnp.array(rng.integers(-7, 8, (M, k)), jnp.int8)
    f = jax.jit(lambda x, r_: fused_quant_matmul(
        x, w, scale, bias, fmt="int4", prologue=None, epilogue="residual",
        residual=r_, out_dtype=jnp.bfloat16))
    r = profile_device_times(f, xl, res, tag="fc232")
    rows.append(("fc2 resid", k, n, r.get("fused_quant_matmul", (0, 0))[0]))

    # patch embed: quant prologue, f32 in
    k, n = 768, 768
    w, bias = mk(k, n)
    xp = jnp.array(rng.standard_normal((B * 196, k)), jnp.float32)
    f = jax.jit(lambda x: fused_quant_matmul(
        x, w, scale, bias, fmt="int4", prologue="quant",
        act_d=d, act_t=t, act_top=top, out_dtype=jnp.bfloat16))
    r = profile_device_times(f, xp, tag="pe32")
    rows.append(("patch quant", k, n, r.get("fused_quant_matmul", (0, 0))[0],
                 B * 196))

    tot_meas = tot_ideal = 0.0
    print(f"{'kernel':14s} {'K':>5s} {'N':>5s} {'meas us':>8s} "
          f"{'ideal us':>8s} {'eff':>5s} {'xblocks'}")
    for row in rows:
        name, k, n, us = row[:4]
        m = row[4] if len(row) > 4 else M
        ideal = 2 * m * k * n / PEAK_INT8 * 1e6
        mult = 12 if name not in ("patch quant",) else 1
        tot_meas += us * mult
        tot_ideal += ideal * mult
        print(f"{name:14s} {k:5d} {n:5d} {us:8.1f} {ideal:8.1f} "
              f"{ideal/max(us,1e-9)*100:4.0f}% x{mult}")

    # attention at bench config
    qkv = jnp.array(rng.standard_normal((B, 224, 3 * 768)) * 0.1, jnp.bfloat16)
    for ia in (False, True):
        f = jax.jit(lambda x, ia=ia: attention_qkv(
            x, heads=12, sm_scale=0.125, n_valid=197,
            out_d=d, out_t=t, out_top=top, int_attention=ia))
        r = profile_device_times(f, qkv, tag=f"attn32_{ia}")
        us = r.get("attention_qkv", (0, 0))[0]
        ideal = 2 * B * 12 * 224 * 208 * 64 * 2 / (PEAK_INT8 if ia else PEAK_BF16) * 1e6
        print(f"{'attn int8' if ia else 'attn bf16':14s} {'':5s} {'':5s} "
              f"{us:8.1f} {ideal:8.1f} {ideal/max(us,1e-9)*100:4.0f}% x12")
        if not ia:
            tot_meas += us * 12
            tot_ideal += ideal * 12

    print(f"\nmatmul+attn total: measured {tot_meas:.0f} us, "
          f"ideal {tot_ideal:.0f} us, eff {tot_ideal/tot_meas*100:.0f}%  "
          f"-> {B / tot_meas * 1e6:.0f} img/s ceiling (no glue)")


if __name__ == "__main__":
    main()
