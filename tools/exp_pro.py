"""Prologue-side experiments for the fused fc1/qkv kernels.

exp_fc1.py showed the GELU epilogue costs only ~32us over the epilogue
floor, yet the production ln_quant+gelu fc1 kernel runs ~90us above that
sum — so the loss is on the prologue side. Variants (bf16 x in, int8 w,
N=3072, gelu_erf epilogue unless noted):

  int8_in      int8 levels in (= exp_fc1 gelu_erf: the floor)
  quant        bf16 in, quantize prologue (round/clip to levels)
  ln_quant     bf16 in, LN + quantize (production form), R=1
  ln_quant_r2  same with row_chunks=2 (production's split)
  ln_sub       LN via two-pass mean/var but computed per 112-row half
  noln_f32     bf16 in, cast f32 + quantize only (isolates LN cost)

Usage: python tools/exp_pro.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.time_kernels import timeit_chain
from quantized_vit_tpu.ops.fused import _ERF_COEFS

M, K, N = 7168, 768, 3072
BM = 224
IDEAL = 2 * M * K * N / 394e12 * 1e6
S = 4


def _erf(v2, v):
    acc = jnp.float32(_ERF_COEFS[-1])
    for c in _ERF_COEFS[-2::-1]:
        acc = acc * v2 + jnp.float32(c)
    return acc * v


def kernel(x_ref, w_ref, g_ref, b_ref, o_ref, *, mode: str):
    d_inv = jnp.float32(20.0)
    c2 = jnp.float32(2.0**-0.5)

    def make_lv(rows):
        if mode == "int8_in":
            return x_ref[rows, :]
        x32 = x_ref[rows, :].astype(jnp.float32)
        if mode in ("ln_quant", "ln_quant_r2", "ln_sub"):
            inv_k = 1.0 / K
            mu = jnp.sum(x32, axis=-1, keepdims=True) * inv_k
            m2 = jnp.sum(x32 * x32, axis=-1, keepdims=True) * inv_k
            var = jnp.maximum(m2 - mu * mu, 0.0)
            x32 = (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * g_ref[0] + b_ref[0]
        return jnp.clip(jnp.round(x32), -7, 7).astype(jnp.int8)

    def dot(lv, cs):
        return jax.lax.dot_general(
            lv, w_ref[:, cs], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def finish(acc, rows, cs):
        y = acc.astype(jnp.float32) * 1e-3
        z = jnp.clip(y * c2, -3.0, 3.0)
        e = _erf(z * z, z)
        w = z * (2.0**0.5 * 0.5) * d_inv
        o_ref[rows, cs] = jnp.clip(jnp.round(w + w * e), -7, 7).astype(jnp.int8)

    r_n = 2 if mode in ("ln_quant_r2", "ln_sub") else 1
    h = BM // r_n
    sub = N // S
    rows_sl = [slice(r * h, (r + 1) * h) for r in range(r_n)]
    cols = [slice(s * sub, (s + 1) * sub) for s in range(S)]
    lvs = [make_lv(rows_sl[0])]
    tasks = [(r, s) for s in range(S) for r in range(r_n)]
    accs = {tasks[0]: dot(lvs[0], cols[0])}
    for r in range(1, r_n):
        lvs.append(make_lv(rows_sl[r]))
    for i, (r, s) in enumerate(tasks):
        if i + 1 < len(tasks):
            rn, sn = tasks[i + 1]
            accs[(rn, sn)] = dot(lvs[rn], cols[sn])
        finish(accs.pop((r, s)), rows_sl[r], cols[s])


def run(mode):
    rng = np.random.default_rng(0)
    if mode == "int8_in":
        x = jnp.array(rng.integers(-7, 8, (M, K)), jnp.int8)
    else:
        x = jnp.array(rng.standard_normal((M, K)) * 2.0, jnp.bfloat16)
    w = jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8)
    g = jnp.ones((1, K), jnp.float32) * 20.0
    b = jnp.zeros((1, K), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    dt = timeit_chain(lambda x: f(x, w, g, b)[0, 0].astype(jnp.float32), x)
    print(f"{mode:11s}: {dt*1e6:7.1f} us ({IDEAL/(dt*1e6)*100:4.1f}% of "
          f"ideal {IDEAL:.1f})", flush=True)


def main():
    for mode in ("int8_in", "noln_f32", "quant", "ln_quant", "ln_quant_r2"):
        run(mode)


if __name__ == "__main__":
    main()
