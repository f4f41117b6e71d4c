"""Bisect the production fused_quant_matmul fc1 config against the leaner
standalone replica (exp_pro.py: 149us) to find the ~70us gap.

Times the REAL ops.fused.fused_quant_matmul at the bench fc1 shape while
monkeypatching _pipeline_splits / dropping features one at a time.

Usage: python tools/exp_prod.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import quantized_vit_tpu.ops.fused as F
from tools.time_kernels import timeit_chain

M, K, N = 7168, 768, 3072
IDEAL = 2 * M * K * N / 394e12 * 1e6


def run(label, rs=None, fmt="int8", bias=True, block_m=None,
        epilogue="gelu_quant"):
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    if fmt == "int8":
        w = jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8)
    else:
        from quantized_vit_tpu.quant.packing import pack_int4
        w = pack_int4(jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8), axis=0)
    b = jnp.array(rng.standard_normal(N) * 0.01, jnp.float32) if bias else None
    g768 = jnp.ones((K,), jnp.float32)
    b768 = jnp.zeros((K,), jnp.float32)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    top = jnp.int32(7)

    orig = F._pipeline_splits
    if rs is not None:
        F._pipeline_splits = lambda np_, bm, prologue: rs
    try:
        kw = dict(fmt=fmt, prologue="ln_quant", act_d=d, act_t=t,
                  act_top=top, ln_scale=g768, ln_bias=b768,
                  epilogue=epilogue, out_dtype=jnp.bfloat16,
                  block_m=block_m)
        if epilogue == "gelu_quant":
            kw.update(out_d=d, out_t=t, out_top=top)
        dt = timeit_chain(
            lambda x: F.fused_quant_matmul(
                x, w, jnp.float32(1e-3), b, **kw)[0, 0].astype(jnp.float32),
            x)
    finally:
        F._pipeline_splits = orig
    print(f"{label:28s}: {dt*1e6:7.1f} us ({IDEAL/(dt*1e6)*100:4.1f}%)",
          flush=True)


def main():
    run("prod w8 (R2,S4)")
    run("prod w8 (R1,S4)", rs=(1, 4))
    run("prod w8 (R1,S2)", rs=(1, 2))
    run("prod w8 (R1,S1)", rs=(1, 1))
    run("prod w8 (R1,S4) nobias", rs=(1, 4), bias=False)
    run("prod w8 (R1,S4) bm448", rs=(1, 4), block_m=448)
    run("prod w8 (R1,S4) no-gelu", rs=(1, 4), epilogue="quant")
    run("prod int4 (R1,S4)", rs=(1, 4), fmt="int4")


if __name__ == "__main__":
    main()
