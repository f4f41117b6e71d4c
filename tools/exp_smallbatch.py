"""Batch 2-7 latency regime (VERDICT r4 #5).

The megakernel serves batch 1 (0.19 ms) and the block kernels require
b >= 8; in between, serving falls to the per-block qkv chain the round-4
bench measured 1.7x slower at batch 1. Continuous batching's max_delay_ms
flushes land exactly there. Measures, per batch in {1, 2, 4, 8}:

  - the per-block kernel CHAIN (current b < 8 route), packed int4
  - the whole-depth MEGAKERNEL extended to small batches (b*224 rows
    resident)
  - the block-kernel path at b = 8 (current route, 208-pad)

Usage (chip): python tools/exp_smallbatch.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.time_kernels import timeit_chain


def main():
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (prepare_latency_artifact,
                                         random_vit_int4_artifact,
                                         vit_int4_forward,
                                         vit_int4_forward_latency)
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    cfg = ViTConfig(num_classes=1000)
    art_packed = random_vit_int4_artifact(cfg, seed=0, pack_weights=True)
    art_int8 = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    rng = np.random.default_rng(0)
    imgs = np.asarray(rng.standard_normal((8, 224, 224, 3)), np.float32)
    p8 = jnp.asarray(patchify_batch(imgs, cfg.patch_size))

    results = {}

    def run(name, fn, x0, iters):
        dt = timeit_chain(fn, x0, iters=iters)
        results[name] = round(dt * 1e3, 3)
        print(f"[done] {name}: {dt * 1e3:.3f} ms/batch "
              f"({x0.shape[0] / dt:.0f} img/s)", flush=True)

    for b in (1, 2, 4, 8):
        x = p8[:b]
        iters = 300 if b <= 2 else 150
        run(f"chain packed b={b}",
            lambda p, b=b: vit_int4_forward(
                art_packed, p, cfg, float_dtype=jnp.bfloat16,
                images_layout="patches")[0, 0].astype(jnp.float32),
            x, iters)
        if b >= 8:
            run(f"blockkernels int8 b={b}",
                lambda p, b=b: vit_int4_forward(
                    art_int8, p, cfg, float_dtype=jnp.bfloat16,
                    images_layout="patches")[0, 0].astype(jnp.float32),
                x, iters)

    # megakernel at small batches (requires the b-cap lifted)
    art_lat, meta = prepare_latency_artifact(art_packed, cfg)
    for b in (1, 2, 4):
        x = p8[:b]
        try:
            run(f"megakernel b={b}",
                lambda p, b=b: vit_int4_forward_latency(
                    art_lat, p, cfg, meta,
                    float_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32),
                x, 300)
        except Exception as e:
            print(f"[skip] megakernel b={b}: {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
