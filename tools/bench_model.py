"""Per-model W4A4 serving bench (ViT-L/16, ViT-H/14, ...) on the real chip.

The headline bench (bench.py) is ViT-B/16; this tool runs the same
poke-chain measurement for the larger family members to show the kernels
generalize (per-block head/hidden geometry is config-driven) and to feed
the TP-crossover analysis in docs/SCALING.md (TP efficiency grows with
model width — see tools/scaling_report.py section 3).

Usage: python tools/bench_model.py [vit_l16|vit_h14|vit_b16] [BATCH]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20
REPS = 3

CONFIGS = {
    "vit_b16": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16),
    "vit_l16": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16),
    "vit_h14": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=14),
}


def _timeit(fn, *args):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_l16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (random_vit_int4_artifact,
                                         vit_int4_forward)
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    cfg = ViTConfig(num_classes=1000, **CONFIGS[name])
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    images = np.random.default_rng(0).standard_normal(
        (batch, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    images_p = jnp.asarray(patchify_batch(images, cfg.patch_size))

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    floor = _timeit(empty, jnp.ones((8,), jnp.float32))

    def _poke(imgs, s):
        upd = (s - s + jnp.ones((), jnp.float32)).astype(imgs.dtype)
        return jax.lax.dynamic_update_slice(
            imgs, upd.reshape((1,) * imgs.ndim), (0,) * imgs.ndim)

    # the artifact is an ARGUMENT, not a closure constant: closed-over
    # arrays ship inside the tunnel's compile request, whose body limit a
    # ViT-L-sized artifact (~300 MB) exceeds (HTTP 413)
    @jax.jit
    def chain(a, imgs):
        def body(i, carry):
            im, acc = carry
            logits = vit_int4_forward(a, im, cfg,
                                      float_dtype=jnp.bfloat16,
                                      images_layout="patches")
            return (_poke(im, logits[0, 0]), acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, ITERS, body, (imgs, jnp.float32(0)))
        return acc

    art = jax.device_put(art)
    dt = max((_timeit(chain, art, images_p) - floor) / ITERS, 1e-9)
    ips = batch / dt

    # int8-MXU roofline MACs/img, MODEL-FLOPs convention (round 5,
    # matching bench.py): useful work = the REAL tokens' matmul MACs —
    # pad rows are implementation overhead, not work
    n_tok = cfg.num_tokens
    d, hid = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    macs = cfg.depth * n_tok * (d * 3 * d + d * d + 2 * d * hid) \
        + cfg.num_patches * (cfg.patch_size**2 * 3) * d + d * 1000
    attn_flops = cfg.depth * 2 * cfg.num_heads * n_tok * n_tok * \
        (d // cfg.num_heads) * 2
    ideal_s = (2 * macs / 394e12 + attn_flops / 197e12) * batch
    print(f"{name} batch {batch}: {dt*1e3:.3f} ms/batch -> "
          f"{ips:.1f} img/s ({ideal_s/dt*100:.1f}% int8-roofline MFU; "
          f"ideal {ideal_s*1e3:.3f} ms/batch)")


if __name__ == "__main__":
    main()
