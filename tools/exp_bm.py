"""Block-M sweep at the new configuration + full-forward batch sweep.

1) qkv/fc1 with explicit block_m 448 (over the default VMEM budget pick of
   224 but under the 16MB Mosaic limit) — larger tiles amortize the
   prologue and weight-stripe revisits.
2) vit_int4_forward (patches layout) at batch 32/64/128 — more rows
   amortize weight streaming and pipeline fill.

Usage: python tools/exp_bm.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.time_kernels import timeit_chain
from quantized_vit_tpu.ops import fused_quant_matmul

M = 7168


def kern(label, k, n, block_m, epi):
    rng = np.random.default_rng(0)
    w = jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8)
    bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
    x = jnp.array(rng.standard_normal((M, k)) * 0.1, jnp.bfloat16)
    g = jnp.ones((k,), jnp.float32)
    b_ = jnp.zeros((k,), jnp.float32)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    kw = dict(fmt="int8", prologue="ln_quant", act_d=d, act_t=t, act_top=7,
              ln_scale=g, ln_bias=b_, out_dtype=jnp.bfloat16,
              block_m=block_m)
    if epi:
        kw.update(epilogue="gelu_quant", out_d=d, out_t=t, out_top=7)
    try:
        dt = timeit_chain(
            lambda x: fused_quant_matmul(
                x, w, jnp.float32(1e-3), bias, **kw)[0, 0]
            .astype(jnp.float32), x)
        print(f"{label} bm={block_m}: {dt*1e6:7.1f} us", flush=True)
    except Exception as e:
        print(f"{label} bm={block_m}: FAIL {type(e).__name__}", flush=True)


def fwd(batch):
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (random_vit_int4_artifact,
                                         vit_int4_forward)
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    cfg = ViTConfig(num_classes=1000)
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    rng = np.random.default_rng(0)
    xp = jnp.asarray(patchify_batch(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32), 16))
    dt = timeit_chain(
        lambda x: vit_int4_forward(
            art, x, cfg, float_dtype=jnp.bfloat16,
            images_layout="patches")[0, 0].astype(jnp.float32),
        xp, iters=200)
    print(f"forward B={batch}: {dt*1e3:7.3f} ms -> {batch/dt:.0f} img/s",
          flush=True)


def main():
    kern("qkv", 768, 2304, None, False)
    kern("qkv", 768, 2304, 448, False)
    kern("fc1", 768, 3072, None, True)
    kern("fc1", 768, 3072, 448, True)
    for b in (32, 64, 128):
        fwd(b)


if __name__ == "__main__":
    main()
