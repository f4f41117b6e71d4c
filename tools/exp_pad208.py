"""Is 208-row token padding (13*16 rows/img) viable vs 224 (7*32)?

197 real tokens pad to 224 today because int8 stream tiles want 32-sublane
alignment and Mosaic reportedly lays 7*2^k*32-row blocks out better than
13-based ones. 208 = 13*16 rows/img would cut 7.1% of every matmul's M —
IF the 13*32-style tiles (bm=416/832) run at the same per-FLOP rate.

Times the serving kernels at m = 32*208 = 6656 with bm in {416, 832} vs
the production m = 32*224 = 7168 at bm=448, and attention at n=208.

Usage: python tools/exp_pad208.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import attention_block, fused_mlp, fused_quant_matmul
from tools.time_kernels import timeit_chain

D = 768
HID = 3072


def main():
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    scale = jnp.float32(1e-3)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    wq = jnp.array(rng.integers(-7, 8, (D, 3 * D)), jnp.int8)
    qb = jnp.array(rng.standard_normal(3 * D) * 0.01, jnp.float32)
    wp = jnp.array(rng.integers(-7, 8, (D, D)), jnp.int8)
    pb = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    w1 = jnp.array(rng.integers(-7, 8, (D, HID)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(HID) * 0.01, jnp.float32)
    w2 = jnp.array(rng.integers(-7, 8, (HID, D)), jnp.int8)
    b2 = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)

    results = {}

    def run(name, fn, x0, iters=1000):
        dt = timeit_chain(fn, x0, iters=iters)
        us = dt * 1e6
        results[name] = round(us, 1)
        print(f"[done] {name}: {us:.1f} us", flush=True)

    mkw = dict(ln_scale=g, ln_bias=be, act_d=d, act_t=t, act_top=7,
               act_pow=False, hid_d=d, hid_t=t, hid_top=7, hid_pow=False,
               out_dtype=jnp.bfloat16)
    qkw = dict(fmt="int8", prologue="ln_quant", act_d=d, act_t=t,
               act_top=jnp.int32(7), ln_scale=g, ln_bias=be,
               out_dtype=jnp.bfloat16)
    akw = dict(ln_scale=g, ln_bias=be, heads=12, sm_scale=64**-0.5,
               n_valid=197, act_d=d, act_t=t, act_top=7, act_pow=False,
               out_d=d, out_t=t, out_top=7, out_pow=False,
               fmt="int8", out_dtype=jnp.bfloat16)

    for n_pad in (224, 208):
        m = 32 * n_pad
        x2 = jnp.array(rng.standard_normal((m, D)) * 0.2, jnp.bfloat16)
        x3 = x2.reshape(32, n_pad, D)
        bms = (448,) if n_pad == 224 else (416, 832)
        for bm in bms:
            run(f"qkv n{n_pad} bm{bm}",
                lambda x, bm=bm: fused_quant_matmul(
                    x, wq, scale, qb, block_m=bm, **qkw
                )[0, 0].astype(jnp.float32), x2)
            run(f"fused_mlp n{n_pad} bm{bm}",
                lambda x, bm=bm: fused_mlp(
                    x, w1, scale, b1, w2, scale, b2, fmt="int8",
                    block_m=bm, **mkw)[0, 0].astype(jnp.float32), x2)
        run(f"attention_block n{n_pad}",
            lambda x: attention_block(
                x, wq, scale, qb, wp, scale, pb, **akw
            )[0, 0, 0].astype(jnp.float32), x3)

    # per-FLOP comparison
    for k in ("qkv", "fused_mlp"):
        a = results.get(f"{k} n224 bm448")
        b = min(v for n, v in results.items()
                if n.startswith(f"{k} n208"))
        if a and b:
            print(f"{k}: n224 {a} us vs n208 best {b} us "
                  f"(FLOP-scaled break-even {a * 208 / 224:.1f})")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
