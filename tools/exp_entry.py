"""Decompose the 430us patch-embed entry section: image quantize vs the
16x16/s16 conv vs alternatives.

Variants:
  quant         image quantize alone (4 VPU passes over [32,224,224,3])
  conv_bf16     the strided conv on pre-quantized bf16 levels (current)
  conv_f32      same conv, f32 input (layout control)
  dygemm        conv as 16 K=48 gemms over within-patch rows (no big
                relayout: merging trailing dims is free, the dy-stride
                slice is sublane-striped)
  patchify_gemm the explicit [B*196, 768] relayout + one gemm (the form
                the r1 notes measured at ~570us)

Usage: python tools/exp_entry.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.time_kernels import timeit_chain
from quantized_vit_tpu.ops.fused import _quantize_f32

B, S, P, D = 32, 224, 16, 768
G = S // P  # 14


def main():
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    images = jnp.array(rng.standard_normal((B, S, S, 3)), jnp.float32)
    img_lv = jnp.array(rng.integers(-7, 8, (B, S, S, 3)), jnp.int8
                       ).astype(jnp.bfloat16)
    w = jnp.array(rng.integers(-7, 8, (P, P, 3, D)), jnp.int8
                  ).astype(jnp.bfloat16)

    dt = timeit_chain(
        lambda im: jnp.sum(_quantize_f32(im, d, t, 7, False)
                           .astype(jnp.bfloat16)[:, 0, 0, 0]
                           .astype(jnp.float32)), images)
    print(f"quant alone:    {dt*1e6:7.1f} us", flush=True)

    def conv(x, wc):
        return jax.lax.conv_general_dilated(
            x, wc, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    dt = timeit_chain(
        lambda x: jnp.sum(conv(x, w)), img_lv)
    print(f"conv bf16:      {dt*1e6:7.1f} us", flush=True)

    dt = timeit_chain(
        lambda x: jnp.sum(conv(x, w.astype(jnp.float32))),
        img_lv.astype(jnp.float32))
    print(f"conv f32:       {dt*1e6:7.1f} us", flush=True)

    # dy-gemm decomposition
    w_dy = w.reshape(P, P * 3, D)  # [16, 48, D]

    def dygemm(x):
        x2 = x.reshape(B, S, S * 3)
        acc = jnp.zeros((B * G * G, D), jnp.float32)
        for dy in range(P):
            rows = x2[:, dy::P, :]                 # [B, 14, 672]
            rows = rows.reshape(B * G, G, P * 3)   # [B*14, 14, 48]
            rows = rows.reshape(B * G * G, P * 3)  # [B*196, 48]
            acc = acc + jax.lax.dot_general(
                rows, w_dy[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    dt = timeit_chain(lambda x: jnp.sum(dygemm(x)), img_lv)
    print(f"dy-gemm x16:    {dt*1e6:7.1f} us", flush=True)

    # explicit patchify + one gemm
    w_flat = w.reshape(P * P * 3, D)

    def patchify(x):
        x5 = x.reshape(B, G, P, G, P * 3)
        x5 = jnp.transpose(x5, (0, 1, 3, 2, 4))   # [B, 14, 14, 16, 48]
        return x5.reshape(B * G * G, P * P * 3)

    dt = timeit_chain(
        lambda x: jnp.sum(patchify(x) @ w_flat), img_lv)
    print(f"patchify+gemm:  {dt*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
