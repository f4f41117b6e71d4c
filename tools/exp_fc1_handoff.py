"""fc1->fc2 GELU-handoff experiment (VERDICT r3 item #2), real chip.

Pairs measured with the 1000-iteration poke-chain (tools/time_kernels.py
method):

A (baseline, round-2 shipping): fc1 = ln_quant -> int8 matmul ->
   dequant+GELU+quant epilogue (int8 out); fc2 = prologue-free int8 matmul
   -> residual epilogue.
B (handoff): fc1 = ln_quant -> int8 matmul -> dequant only, 1/sqrt(2)
   folded into scale/bias (bf16 z out); fc2 = gelu_quant PROLOGUE -> int8
   matmul -> residual. Doubles the fc1->fc2 HBM traffic (bf16 vs int8) but
   moves ~7 VPU passes over the 22M-element hidden tensor from fc1's
   serialized epilogue into fc2's prologue, where the row-chunk pipeline
   overlaps them with the MXU dots.
C: baseline with n_stripes sweep (does more epilogue/dot interleave help?).

Usage: python tools/exp_fc1_handoff.py [BATCH]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import fused_quant_matmul
from quantized_vit_tpu.ops import fused as F

ITERS = 1000
REPS = 3
PEAK_INT8 = 394e12


def timeit_chain(step, x0, iters=ITERS):
    def poke(x, s):
        upd = (s - s + jnp.ones((), jnp.float32)).astype(x.dtype)
        return jax.lax.dynamic_update_slice(
            x, upd.reshape((1,) * x.ndim), (0,) * x.ndim)

    @jax.jit
    def chain(x):
        def body(i, carry):
            x, acc = carry
            s = step(x)
            return (poke(x, s), acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    def run(fn, arg):
        float(fn(arg)); float(fn(arg))
        ts = []
        for _ in range(REPS):
            t0 = time.time(); float(fn(arg)); ts.append(time.time() - t0)
        return min(ts)

    floor = run(empty, jnp.ones((8,), jnp.float32))
    total = run(chain, x0)
    return max((total - floor) / iters, 1e-9)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m = batch * 224
    d, hid = 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((m, d)) * 0.3, jnp.bfloat16)
    w1 = jnp.array(rng.integers(-7, 8, (d, hid)), jnp.int8)
    w2 = jnp.array(rng.integers(-7, 8, (hid, d)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(hid) * 0.01, jnp.float32)
    b2 = jnp.array(rng.standard_normal(d) * 0.01, jnp.float32)
    g = jnp.array(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32)
    be = jnp.array(rng.standard_normal(d) * 0.01, jnp.float32)
    s1 = jnp.float32(1e-3)
    s2 = jnp.float32(1e-3)
    d_a = jnp.float32(0.05)

    common1 = dict(fmt="int8", prologue="ln_quant", act_d=d_a,
                   act_t=jnp.float32(1.0), act_top=127, ln_scale=g,
                   ln_bias=be)

    ideal1 = 2 * m * d * hid / PEAK_INT8 * 1e6
    ideal2 = 2 * m * hid * d / PEAK_INT8 * 1e6

    # --- A: baseline pair
    def fc1_a(x):
        return fused_quant_matmul(
            x, w1, s1, b1, epilogue="gelu_quant", out_d=d_a,
            out_t=jnp.float32(1.0), out_top=127, out_dtype=jnp.bfloat16,
            **common1)
    hlv = fc1_a(x)

    def fc2_a(h):
        y = fused_quant_matmul(h, w2, s2, b2, fmt="int8", prologue=None,
                               epilogue="residual", residual=x,
                               out_dtype=jnp.bfloat16)
        return y[0, 0].astype(jnp.float32)

    t1a = timeit_chain(lambda xx: fc1_a(xx)[0, 0].astype(jnp.float32), x)
    t2a = timeit_chain(fc2_a, hlv)
    print(f"A fc1(gelu epi) {t1a*1e6:7.1f}us ({ideal1/t1a*1e-6*100:4.1f}%)  "
          f"fc2(int8-in)  {t2a*1e6:7.1f}us ({ideal2/t2a*1e-6*100:4.1f}%)  "
          f"pair {(t1a+t2a)*1e6:7.1f}us")

    # --- B: handoff pair
    inv_sqrt2 = jnp.float32(2.0**-0.5)

    def fc1_b(x):
        return fused_quant_matmul(
            x, w1, s1 * inv_sqrt2, b1 * inv_sqrt2, epilogue=None,
            out_dtype=jnp.bfloat16, **common1)
    z = fc1_b(x)

    def fc2_b(h):
        y = fused_quant_matmul(h, w2, s2, b2, fmt="int8",
                               prologue="gelu_quant", act_d=d_a,
                               act_t=jnp.float32(1.0), act_top=127,
                               epilogue="residual", residual=x,
                               out_dtype=jnp.bfloat16)
        return y[0, 0].astype(jnp.float32)

    t1b = timeit_chain(lambda xx: fc1_b(xx)[0, 0].astype(jnp.float32), x)
    t2b = timeit_chain(fc2_b, z)
    print(f"B fc1(z out)    {t1b*1e6:7.1f}us ({ideal1/t1b*1e-6*100:4.1f}%)  "
          f"fc2(gelu pro) {t2b*1e6:7.1f}us ({ideal2/t2b*1e-6*100:4.1f}%)  "
          f"pair {(t1b+t2b)*1e6:7.1f}us")

    # numerics: B vs A level agreement through fc2 output
    ya = fused_quant_matmul(x, w1, s1, b1, epilogue="gelu_quant", out_d=d_a,
                            out_t=jnp.float32(1.0), out_top=127,
                            out_dtype=jnp.bfloat16, **common1)
    za = fused_quant_matmul(x, w1, s1 * inv_sqrt2, b1 * inv_sqrt2,
                            epilogue=None, out_dtype=jnp.bfloat16, **common1)
    lv_b = F._gelu_quant_folded(np.asarray(za, np.float32), float(d_a), 127)
    diff = np.abs(np.asarray(ya, np.int32) - np.asarray(lv_b, np.int32))
    print(f"   B-vs-A hidden-level diff: max {diff.max()}, "
          f"frac>0 {(diff > 0).mean():.5f} (bf16 z rounding)")

    # --- C: stripe sweep on baseline fc1
    orig = F._pipeline_splits
    for s_n in (2, 3, 4, 6, 8):
        F._pipeline_splits = lambda np_, bm, prologue, _s=s_n: (1, _s)
        F._fused_quant_matmul.clear_cache()
        try:
            t = timeit_chain(
                lambda xx: fc1_a(xx)[0, 0].astype(jnp.float32), x)
            print(f"C fc1 stripes={s_n}: {t*1e6:7.1f}us "
                  f"({ideal1/t*1e-6*100:4.1f}%)")
        finally:
            F._pipeline_splits = orig
    F._fused_quant_matmul.clear_cache()


if __name__ == "__main__":
    main()
