"""Time the attention kernel and the patch-embed entry section in isolation
(before/after the min-clamp and patch_finalize changes).

Usage: python tools/exp_glue.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.time_kernels import timeit_chain
from quantized_vit_tpu.ops import attention_qkv
from quantized_vit_tpu.ops.patch import patch_finalize

B = 32
D = 768


def main():
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)

    qkv = jnp.array(rng.standard_normal((B, 224, 3 * D)) * 0.1, jnp.bfloat16)
    dt = timeit_chain(
        lambda x: attention_qkv(
            x, heads=12, sm_scale=0.125, n_valid=197,
            out_d=d, out_t=t, out_top=7)[0, 0, 0].astype(jnp.float32), qkv)
    print(f"attn (min-clamp): {dt*1e6:7.1f} us", flush=True)

    # patch_finalize kernel alone
    acc = jnp.array(rng.standard_normal((B, 196, D)), jnp.float32)
    pos = jnp.array(rng.standard_normal((196, D)) * 0.02, jnp.float32)
    cls = jnp.array(rng.standard_normal(D) * 0.02, jnp.float32)
    dt = timeit_chain(
        lambda a: patch_finalize(a, pos, cls, jnp.float32(1e-3),
                                 n_pad=224)[0, 0].astype(jnp.float32), acc)
    print(f"patch_finalize:   {dt*1e6:7.1f} us", flush=True)

    # the old XLA glue chain for comparison
    def xla_glue(a):
        body = a * 1e-3 + pos
        x = jnp.concatenate(
            [body, jnp.broadcast_to(cls, (B, 1, D))], axis=1
        ).astype(jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (0, 27), (0, 0)))
        return jnp.sum(x[:, 0, 0].astype(jnp.float32))

    dt = timeit_chain(xla_glue, acc)
    print(f"xla glue chain:   {dt*1e6:7.1f} us", flush=True)

    # full entry section: quantize + conv + finalize
    from quantized_vit_tpu.ops.fused import _quantize_f32

    images = jnp.array(rng.standard_normal((B, 224, 224, 3)), jnp.float32)
    wc = jnp.array(rng.integers(-7, 8, (16, 16, 3, D)), jnp.int8)

    def entry(imgs):
        lv = _quantize_f32(imgs, d, t, 7, False).astype(jnp.bfloat16)
        a = jax.lax.conv_general_dilated(
            lv, wc.astype(jnp.bfloat16), window_strides=(16, 16),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        x2d = patch_finalize(a.reshape(B, 196, D), pos, cls,
                             jnp.float32(1e-3), n_pad=224)
        return x2d[0, 0].astype(jnp.float32)

    dt = timeit_chain(entry, images)
    print(f"entry (q+conv+fin): {dt*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
