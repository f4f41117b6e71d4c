"""Attention grid-granularity experiment: J images per program.

The production attention_qkv runs one image per program (grid=32 at the
bench batch): per-program fixed costs (DMA setup, loop prologue, pipeline
fill across the 12-head loop) may dominate the ~3.8us of real work. This
times J in {1, 2, 4} with the production head-loop software pipeline.

Usage: python tools/exp_attn2.py
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
from quantized_vit_tpu.ops.attention import (_n_keys, _score_one_head,
                                             _softmax_av)

B, N, H, HD = 32, 224, 12, 64
NV = 197


def kernel(x_ref, d_ref, o_ref, *, j_imgs: int, heads: int, head_dim: int,
           sm_scale: float, n_valid: int, out_top: int):
    nk = _n_keys(N, n_valid, 2)
    hdim = heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (N, nk), 1)

    def qkv_h(j, h):
        x = x_ref[j]
        q = x[:, h * head_dim:(h + 1) * head_dim]
        k = x[:nk, hdim + h * head_dim:hdim + (h + 1) * head_dim]
        v = x[:nk, 2 * hdim + h * head_dim:2 * hdim + (h + 1) * head_dim]
        return q, k, v

    tasks = [(j, h) for j in range(j_imgs) for h in range(heads)]
    q0, k0, v0 = qkv_h(*tasks[0])
    s_next = _score_one_head(q0, k0, sm_scale, False)
    v_cur = v0
    for i, (j, h) in enumerate(tasks):
        s_cur, v_use = s_next, v_cur
        if i + 1 < len(tasks):
            jn, hn = tasks[i + 1]
            q1, k1, v_cur = qkv_h(jn, hn)
            s_next = _score_one_head(q1, k1, sm_scale, False)
        o_un, p_sum = _softmax_av(s_cur, v_use, col, n_valid, False)
        lv = jnp.clip(jnp.round(o_un * (1.0 / (p_sum * d_ref[0]))),
                      -float(out_top), float(out_top))
        o_ref[j, :, h * head_dim:(h + 1) * head_dim] = lv.astype(jnp.int8)


def run(j_imgs):
    rng = np.random.default_rng(0)
    qkv = jnp.array(rng.standard_normal((B, N, 3 * H * HD)) * 0.1,
                    jnp.bfloat16)
    d = jnp.full((1,), 0.05, jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel, j_imgs=j_imgs, heads=H, head_dim=HD,
                          sm_scale=0.125, n_valid=NV, out_top=7),
        grid=(B // j_imgs,),
        in_specs=[
            pl.BlockSpec((j_imgs, N, 3 * H * HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((j_imgs, N, H * HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * HD), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    dt = timeit_chain(lambda x: f(x, d)[0, 0, 0].astype(jnp.float32), qkv)
    print(f"J={j_imgs}: {dt*1e6:7.1f} us", flush=True)


def main():
    for j in (1, 2, 4):
        run(j)


if __name__ == "__main__":
    main()
