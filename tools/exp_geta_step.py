"""Isolate where the GETA warmup step's time goes on chip.

tools/exp_train_decomp.py measured fake-quant fwd+bwd at 40.5 ms/step,
yet tools/bench_train.py measures the full composite step (fwd+bwd +
grad-variant + warmup apply) at 158.7 ms. This chains the SAME body as
bench_train but in three growing stages:

  fb        — fwd+bwd only (sanity vs exp_train_decomp)
  fb+gv     — + _compute_grad_variant (momentum)
  fb+gv+ap  — + the warmup apply_fn (gd_tree + zero_pruned) = full step

Run on the chip: python tools/exp_geta_step.py
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

    from quantized_vit_tpu.graph import OTO
    from quantized_vit_tpu.models import (QuantConfig, VisionTransformer,
                                          init_quant_params_tree)
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.opt.geta import _compute_grad_variant
    from quantized_vit_tpu.utils.losses import (cross_entropy_onehot_target,
                                                one_hot)

    rng = np.random.default_rng(0)
    images = jnp.array(rng.standard_normal((BATCH, 224, 224, 3)) * 0.5,
                       jnp.float32)
    labels = jnp.array(rng.integers(0, 1000, BATCH))
    floor = measure_floor()
    print(json.dumps({"rpc_floor_ms": round(floor * 1e3, 1)}), flush=True)

    cfg = ViTConfig(num_classes=1000, quant=QuantConfig(enabled=True))
    model = VisionTransformer(cfg)
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images[:1]))["params"]
    params = jax.tree.map(
        lambda s: jnp.array(
            rng.standard_normal(s.shape).astype(np.float32) * 0.02),
        flax.core.unfreeze(abstract))
    params = init_quant_params_tree(params, init_bits=8.0)

    oto = OTO(model, params)
    oto.mark_unprunable_by_param_names(
        ["patch_embed", "pos_embed", "cls_token", "head"])
    opt = oto.geta(lr=1e-3, lr_quant=1e-4, variant="sgd",
                   target_group_sparsity=0.0,
                   start_projection_step=10**9,
                   projection_steps=1, start_pruning_step=10**9 + 1,
                   pruning_steps=1)

    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x, deterministic=True)
        return cross_entropy_onehot_target(logits, one_hot(y, 1000))

    loss0, grads0 = jax.value_and_grad(loss_fn)(params, images, labels)
    params = opt.step(params, grads0)
    m1, m2 = opt.m1, opt.m2
    vcfg = opt.cfg
    opt._dispatch(params, jax.tree.map(jnp.zeros_like, params),
                  "warmup", (), 0)
    apply_fn = opt._apply_cache[("warmup", ())]
    scalars = dict(lr=jnp.float32(vcfg.lr),
                   lr_quant=jnp.float32(vcfg.lr_quant),
                   max_bit_wt=jnp.float32(opt.max_bit_wt),
                   max_bit_act=jnp.float32(opt.max_bit_act))
    active = opt._masks("active_redundant")
    pruned = opt._masks("pruned")

    def make(stage):
        @jax.jit
        def chain(params, m1, m2, images, labels):
            def body(i, carry):
                p, m1, m2 = carry
                _, grads = jax.value_and_grad(loss_fn)(p, images, labels)
                if stage == "fb":
                    # poke p through grads so the loop isn't hoisted
                    g0 = jax.tree.leaves(grads)[0].reshape(-1)[0]
                    p = dict(p)
                    p["cls_token"] = p["cls_token"] + g0 * 1e-30
                    return p, m1, m2
                gv, m1, m2 = _compute_grad_variant(
                    p, grads, m1, m2, jnp.float32(5), vcfg.variant,
                    vcfg.first_momentum, vcfg.second_momentum,
                    vcfg.dampening, vcfg.weight_decay)
                if stage == "fb+gv":
                    p = dict(p)
                    p["cls_token"] = (
                        p["cls_token"]
                        + jax.tree.leaves(gv)[0].reshape(-1)[0] * 1e-30)
                    return p, m1, m2
                if stage == "fb+gv+sgd":
                    # plain full-tree descent: consumes EVERY gv leaf (no
                    # DCE) — the honest composite floor the GETA apply
                    # should approach
                    p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, gv)
                    return p, m1, m2
                p = apply_fn(p, gv, active, pruned, scalars)
                return p, m1, m2
            p, m1, m2 = jax.lax.fori_loop(0, ITERS, body, (params, m1, m2))
            return jax.tree.leaves(p)[0].reshape(-1)[0]
        return chain

    prev = 0.0
    for stage in ("fb", "fb+gv", "fb+gv+sgd", "fb+gv+ap"):
        dt = max((timeit(make(stage), params, m1, m2, images, labels)
                  - floor) / ITERS, 1e-9)
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "delta_ms": round((dt - prev) * 1e3, 2)}),
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
