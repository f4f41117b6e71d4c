"""Round-5 regression hunt: time the ACTUAL serving block kernels at the
bench configuration and compare against the round-3 table (KERNELS.md:
attention_block 179.7 us, fused MLP 212.6 us — those were fmt='int4'
packed; round 4's serving default is unpacked int8 levels).

Times, at batch 32 / M = 7168 / ViT-B geometry:
  - attention_block (fmt int8 and int4)
  - fused_mlp        (fmt int8 and int4)
  - the full _vit_block composition (what the forward actually runs)
  - fused_mlp at alternative bm tiles (448 / 576 / 896-capped)

Usage: python tools/exp_r5_regress.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import attention_block, fused_mlp
from quantized_vit_tpu.quant.packing import pack_int4
from tools.time_kernels import timeit_chain

BATCH = 32
N_PAD = 224
D = 768
HID = 3072
HEADS = 12
HD = 64


def main():
    rng = np.random.default_rng(0)
    m = BATCH * N_PAD
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    scale = jnp.float32(1e-3)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    x3 = jnp.array(rng.standard_normal((BATCH, N_PAD, D)) * 0.2, jnp.bfloat16)
    x2 = x3.reshape(m, D)

    wq8 = jnp.array(rng.integers(-7, 8, (D, 3 * D)), jnp.int8)
    qb = jnp.array(rng.standard_normal(3 * D) * 0.01, jnp.float32)
    wp8 = jnp.array(rng.integers(-7, 8, (D, D)), jnp.int8)
    pb = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    w18 = jnp.array(rng.integers(-7, 8, (D, HID)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(HID) * 0.01, jnp.float32)
    w28 = jnp.array(rng.integers(-7, 8, (HID, D)), jnp.int8)
    b2 = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)

    results = {}

    def run(name, fn, x0, iters=1000):
        dt = timeit_chain(fn, x0, iters=iters)
        us = dt * 1e6
        results[name] = round(us, 1)
        print(f"[done] {name}: {us:.1f} us", flush=True)

    akw = dict(ln_scale=g, ln_bias=be, heads=HEADS, sm_scale=HD**-0.5,
               n_valid=197, act_d=d, act_t=t, act_top=7, act_pow=False,
               out_d=d, out_t=t, out_top=7, out_pow=False,
               out_dtype=jnp.bfloat16)
    for fmt, WQ, WP in (
            ("int8", wq8, wp8),
            ("int4", pack_int4(wq8, axis=0), pack_int4(wp8, axis=0))):
        run(f"attention_block {fmt}",
            lambda x, WQ=WQ, WP=WP, fmt=fmt: attention_block(
                x, WQ, scale, qb, WP, scale, pb, fmt=fmt, **akw
            )[0, 0, 0].astype(jnp.float32), x3)

    mkw = dict(ln_scale=g, ln_bias=be, act_d=d, act_t=t, act_top=7,
               act_pow=False, hid_d=d, hid_t=t, hid_top=7, hid_pow=False,
               out_dtype=jnp.bfloat16)
    for fmt, W1, W2 in (
            ("int8", w18, w28),
            ("int4", pack_int4(w18, axis=0), pack_int4(w28, axis=0))):
        run(f"fused_mlp {fmt} (auto bm)",
            lambda x, W1=W1, W2=W2, fmt=fmt: fused_mlp(
                x, W1, scale, b1, W2, scale, b2, fmt=fmt, **mkw
            )[0, 0].astype(jnp.float32), x2)

    # bm sweep for the int8 fused_mlp (the serving default)
    for bm in (224, 448, 896):
        try:
            run(f"fused_mlp int8 bm={bm}",
                lambda x, bm=bm: fused_mlp(
                    x, w18, scale, b1, w28, scale, b2, fmt="int8",
                    block_m=bm, **mkw)[0, 0].astype(jnp.float32), x2)
        except Exception as e:
            print(f"[skip] bm={bm}: {type(e).__name__}: {e}", flush=True)

    # stripe sweep for the int8 fused_mlp at the auto bm
    for st in (4, 8, 12):
        run(f"fused_mlp int8 stripes={st}",
            lambda x, st=st: fused_mlp(
                x, w18, scale, b1, w28, scale, b2, fmt="int8",
                stripes=st, **mkw)[0, 0].astype(jnp.float32), x2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
