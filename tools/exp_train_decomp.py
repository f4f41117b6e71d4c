"""Decompose the QAT training-step cost on chip (follow-up to
tools/bench_train.py: QAT 158.7 ms/step vs 52.4 f32 / 36.1 bf16).

Measures forward-only and forward+backward chains for four model
configurations at ViT-B/16 batch 32 so the 3x QAT overhead can be
attributed to its parts:

  f32            — unquantized, f32 params (reference precision)
  qat_wa         — fake-quant weights AND activations (training config)
  qat_linear     — linear quantizer (no learnable-t x^t power map)
  qat_w          — fake-quant weights only (isolates the activation
                   quantizers, whose tensors are batch-sized)
  bf16           — unquantized bf16 (the MXU-rate bound)

Forward-only chains measure the fake-quant forward cost; the fwd+bwd
chain carries the params through a full-tree SGD write so EVERY gradient
leaf is consumed — a one-leaf poke lets XLA dead-code the entire
weight-gradient path and under-measures the backward ~4x (found the
hard way; see also exp_geta_step.py). Results (v5e, documented in
docs/PERFORMANCE.md "QAT training step"): f32 49.3 ms, weights-only QAT
51.9, weights+acts QAT 158.9, linear quantizer 150.0, bf16 35.2 — the
QAT overhead is the ACTIVATION quantizers' backward, not the weight
path, the power map, or the GETA apply.

Run on the chip: python tools/exp_train_decomp.py
"""
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

from _bench_util import measure_floor, timeit

BATCH = 32
ITERS = 10


def main():
    import flax

    from quantized_vit_tpu.models import (QuantConfig, VisionTransformer,
                                          init_quant_params_tree)
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.utils.losses import (cross_entropy_onehot_target,
                                                one_hot)

    rng = np.random.default_rng(0)
    images = jnp.array(rng.standard_normal((BATCH, 224, 224, 3)) * 0.5,
                       jnp.float32)
    labels = jnp.array(rng.integers(0, 1000, BATCH))
    floor = measure_floor()
    print(json.dumps({"rpc_floor_ms": round(floor * 1e3, 1)}), flush=True)

    def build(quant: QuantConfig, dtype):
        cfg = ViTConfig(num_classes=1000, quant=quant)
        model = VisionTransformer(cfg)
        abstract = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), images[:1]))["params"]
        params = jax.tree.map(
            lambda s: jnp.array(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02,
                dtype),
            flax.core.unfreeze(abstract))
        if quant.enabled:
            params = init_quant_params_tree(params, init_bits=8.0)

        def loss_fn(p, x, y):
            logits = model.apply({"params": p}, x.astype(dtype),
                                 deterministic=True)
            return cross_entropy_onehot_target(
                logits.astype(jnp.float32), one_hot(y, 1000))

        return params, loss_fn

    variants = {
        "f32": (QuantConfig.off(), jnp.float32),
        "qat_wa": (QuantConfig(enabled=True), jnp.float32),
        "qat_linear": (QuantConfig(enabled=True, nonlinear=False),
                       jnp.float32),
        "qat_w": (QuantConfig(enabled=True, quantize_acts=False),
                  jnp.float32),
        "bf16": (QuantConfig.off(), jnp.bfloat16),
    }

    for name, (quant, dtype) in variants.items():
        params, loss_fn = build(quant, dtype)

        @jax.jit
        def fwd_chain(params, images, labels):
            def body(i, carry):
                x, acc = carry
                L = loss_fn(params, x, labels)
                x = jax.lax.dynamic_update_slice(
                    x, (L * 1e-20).reshape(1, 1, 1, 1).astype(x.dtype),
                    (0, 0, 0, 0))
                return x, acc + L
            _, acc = jax.lax.fori_loop(
                0, ITERS, body, (images, jnp.float32(0)))
            return acc

        @jax.jit
        def fb_chain(params, images, labels):
            # params carried through a full-tree SGD write: consumes EVERY
            # grad leaf, so the weight-gradient path cannot be DCE'd (the
            # first-leaf poke hollowed the backward to dx-only)
            def body(i, carry):
                p, acc = carry
                L, grads = jax.value_and_grad(loss_fn)(p, images, labels)
                p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads)
                return p, acc + L
            p, acc = jax.lax.fori_loop(
                0, ITERS, body, (params, jnp.float32(0)))
            return acc + jax.tree.leaves(p)[0].reshape(-1)[0]

        row = {"variant": name}
        for tag, chain in (("fwd", fwd_chain), ("fwd_bwd", fb_chain)):
            dt = max((timeit(chain, params, images, labels) - floor)
                     / ITERS, 1e-9)
            row[f"{tag}_ms"] = round(dt * 1e3, 2)
        row["bwd_ms"] = round(row["fwd_bwd_ms"] - row["fwd_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
