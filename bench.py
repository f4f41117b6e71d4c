"""Headline benchmark: ViT-B/16 W4A4 INT4 serving throughput on one chip.

Prints ONE JSON line:
  {"metric": "vit_b16_w4a4_images_per_sec_chip", "value": N,
   "unit": "images/s", "vs_baseline": R}

vs_baseline = speedup over the bf16 XLA forward of the same model on the
same chip (the reference publishes no numbers — BASELINE.md — so the bf16
forward is the stand-in for the float fake-quant path the reference runs).

Timing method (see .claude/skills/verify/SKILL.md): this environment's TPU
tunnel has a ~26ms RPC floor per dispatch and block_until_ready does not
truly block, so each measurement chains ITERS forwards inside ONE jit with a
data dependency and forces completion via a host scalar read; the RPC floor
is measured with an empty jit and subtracted.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# batch 32 is the single-chip throughput sweet spot (batch 8 ~3.7k img/s,
# 32 ~3.9k; flat beyond — the model is MXU-bound, see PROGRESS notes)
BATCH = 32
ITERS = 30
REPS = 3


def _timeit(fn, *args):
    float(fn(*args))  # compile + warm
    float(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (
        random_vit_int4_artifact,
        vit_int4_forward,
    )

    cfg = ViTConfig(num_classes=1000)
    art = random_vit_int4_artifact(cfg, seed=0)
    images = jnp.array(
        np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
        jnp.float32,
    )

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    floor = _timeit(empty, jnp.ones((8,), jnp.float32))

    @jax.jit
    def int4_chain(images):
        def body(i, carry):
            imgs, acc = carry
            logits = vit_int4_forward(art, imgs, cfg, float_dtype=jnp.bfloat16)
            fb = (logits[0, 0] - logits[0, 0]).astype(imgs.dtype)
            return (imgs + fb, acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, ITERS, body, (images, jnp.float32(0)))
        return acc

    dt_int4 = max(( _timeit(int4_chain, images) - floor) / ITERS, 1e-9)
    ips_int4 = BATCH / dt_int4

    # bf16 baseline: same architecture, plain XLA bf16 matmuls
    import flax
    from quantized_vit_tpu.models import QuantConfig, VisionTransformer

    model = VisionTransformer(ViTConfig(num_classes=1000, quant=QuantConfig.off()))
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1])
    )["params"]
    rng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda s: jnp.array(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02, jnp.bfloat16
        ),
        abstract,
    )
    images_bf16 = images.astype(jnp.bfloat16)

    @jax.jit
    def bf16_chain(images):
        def body(i, carry):
            imgs, acc = carry
            logits = model.apply({"params": params}, imgs)
            fb = (logits[0, 0] - logits[0, 0]).astype(imgs.dtype)
            return (imgs + fb, acc + logits[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (images, jnp.float32(0)))
        return acc

    dt_bf16 = max((_timeit(bf16_chain, images_bf16) - floor) / ITERS, 1e-9)
    ips_bf16 = BATCH / dt_bf16

    print(json.dumps({
        "metric": "vit_b16_w4a4_images_per_sec_chip",
        "value": round(ips_int4, 1),
        "unit": "images/s",
        "vs_baseline": round(ips_int4 / ips_bf16, 3),
        "detail": {
            "batch": BATCH,
            "int4_ms_per_batch": round(dt_int4 * 1e3, 3),
            "bf16_ms_per_batch": round(dt_bf16 * 1e3, 3),
            "bf16_images_per_sec": round(ips_bf16, 1),
            "rpc_floor_ms": round(floor * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
