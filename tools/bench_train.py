"""On-chip QAT training-step bench (VERDICT r3 missing #3 / next #5).

The reference's center of gravity is QAT training (QViT_with_GETA/
utils.py:197-325 train_one_epoch + GETA step); the build trains correctly
(accuracy rehearsal) but had no on-chip training perf number. This tool
measures ONE COMPOSITE JITTED STEP — fake-quant ViT-B/16 forward + backward
+ GETA update (grad-variant momentum + the phase apply), batch 32 — against
the same-architecture unquantized bf16 step with SGD-momentum, both
chain-timed (bench.py poke method: the params carry IS the data dependency,
so no poke is needed).

Phase note: the chain freezes the GETA step in one phase ('warmup' = plain
decayed update, or 'range' = in-projection bit-range step). Period-boundary
host logic (importance scores, redundant-group commits) runs a handful of
times per TRAINING RUN, not per step, and is excluded — this is the steady
hot-loop cost.

Writes the results into MEASURED.json (train_* keys) and prints JSON.
Run on the chip:  python tools/bench_train.py
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 32
ITERS = 10
REPS = 3


from _bench_util import measure_floor, timeit


def _timeit(fn, *args):
    # shared harness (tools/_bench_util.py); chains return a host scalar,
    # float() forces completion — the only reliable sync on the tunnel
    return timeit(fn, *args, reps=REPS)


def main():
    import flax
    import optax

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
    out = {"rpc_floor_ms": round(floor * 1e3, 1)}

    # ---- fake-quant ViT-B + GETA --------------------------------------
    cfg = ViTConfig(num_classes=1000, quant=QuantConfig(enabled=True))
    # mixed-precision variant measured alongside (QuantConfig.matmul_dtype
    # — dense/conv/attention dots on the bf16 MXU, quantizer math f32;
    # convergence validated on the sensitive rehearsal task, delta within
    # noise)
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

    # one real host step initializes momentum state + the apply cache
    loss0, grads0 = jax.value_and_grad(loss_fn)(params, images, labels)
    params = opt.step(params, grads0)
    m1, m2 = opt.m1, opt.m2
    vcfg = opt.cfg

    def make_chain(phase):
        apply_fn = opt._apply_cache.get((phase, ()))
        if apply_fn is None:
            opt._dispatch(params, jax.tree.map(jnp.zeros_like, params),
                          phase, (), 0)
            apply_fn = opt._apply_cache[(phase, ())]
        scalars = dict(lr=jnp.float32(vcfg.lr),
                       lr_quant=jnp.float32(vcfg.lr_quant),
                       max_bit_wt=jnp.float32(opt.max_bit_wt),
                       max_bit_act=jnp.float32(opt.max_bit_act))
        active = opt._masks("active_redundant")
        pruned = opt._masks("pruned")

        @jax.jit
        def chain(params, m1, m2, images, labels):
            def body(i, carry):
                p, m1, m2 = carry
                _, grads = jax.value_and_grad(loss_fn)(p, images, labels)
                gv, m1, m2 = _compute_grad_variant(
                    p, grads, m1, m2, jnp.float32(5), vcfg.variant,
                    vcfg.first_momentum, vcfg.second_momentum,
                    vcfg.dampening, vcfg.weight_decay)
                p = apply_fn(p, gv, active, pruned, scalars)
                return p, m1, m2
            p, m1, m2 = jax.lax.fori_loop(0, ITERS, body, (params, m1, m2))
            return jax.tree.leaves(p)[0].reshape(-1)[0]
        return chain

    # bf16-matmul QAT step (plain SGD tree update — the GETA apply adds
    # ~0.15 ms, measured round 4): the mixed-precision training number
    def bench_bf16mm():
        cfg_b = ViTConfig(num_classes=1000,
                          quant=QuantConfig(enabled=True,
                                            matmul_dtype="bfloat16"))
        model_b = VisionTransformer(cfg_b)

        def loss_b(p, x, y):
            logits = model_b.apply({"params": p}, x, deterministic=True)
            return cross_entropy_onehot_target(logits, one_hot(y, 1000))

        @jax.jit
        def chain(p, x, y):
            def body(i, carry):
                pp, acc = carry
                LV, grads = jax.value_and_grad(loss_b)(pp, x, y)
                pp = jax.tree.map(lambda a, g: a - 1e-3 * g, pp, grads)
                return pp, acc + LV
            pp, acc = jax.lax.fori_loop(0, ITERS, body,
                                        (p, jnp.float32(0)))
            return acc + jax.tree.leaves(pp)[0].reshape(-1)[0]

        dt = max((_timeit(chain, params, images, labels) - floor) / ITERS,
                 1e-9)
        out["train_qat_bf16mm_ms_per_step_b32"] = round(dt * 1e3, 3)
        print(f"QAT bf16-matmul: {dt*1e3:.3f} ms/step "
              f"({BATCH/dt:.0f} img/s)", flush=True)

    try:
        bench_bf16mm()
    except Exception as e:  # pragma: no cover
        print(f"QAT bf16mm failed: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    for phase in ("warmup", "range"):
        try:
            dt = max((_timeit(make_chain(phase), params, m1, m2, images,
                              labels) - floor) / ITERS, 1e-9)
            out[f"train_qat_{phase}_ms_per_step_b32"] = round(dt * 1e3, 3)
            print(f"QAT {phase}: {dt*1e3:.3f} ms/step "
                  f"({BATCH/dt:.0f} img/s)", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"QAT {phase} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # ---- bf16 unquantized baseline ------------------------------------
    model_f = VisionTransformer(ViTConfig(num_classes=1000,
                                          quant=QuantConfig.off()))
    abstract_f = jax.eval_shape(
        lambda: model_f.init(jax.random.PRNGKey(0), images[:1]))["params"]

    def baseline(dtype, key):
        params_f = jax.tree.map(
            lambda s: jnp.array(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02,
                dtype),
            flax.core.unfreeze(abstract_f))
        tx = optax.sgd(1e-3, momentum=0.9)
        opt_state = tx.init(params_f)

        def loss_f(p, x, y):
            logits = model_f.apply({"params": p}, x.astype(dtype))
            return cross_entropy_onehot_target(
                logits.astype(jnp.float32), one_hot(y, 1000))

        @jax.jit
        def c(params, opt_state, images, labels):
            def body(i, carry):
                p, s = carry
                _, grads = jax.value_and_grad(loss_f)(p, images, labels)
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return p, s
            p, s = jax.lax.fori_loop(0, ITERS, body, (params, opt_state))
            return jax.tree.leaves(p)[0].astype(jnp.float32).reshape(-1)[0]

        dt = max((_timeit(c, params_f, opt_state, images, labels)
                  - floor) / ITERS, 1e-9)
        out[key] = round(dt * 1e3, 3)
        print(f"{key}: {dt*1e3:.3f} ms/step ({BATCH/dt:.0f} img/s)",
              flush=True)
        return dt

    dt_bf16 = baseline(jnp.bfloat16, "train_bf16_ms_per_step_b32")
    # the QAT model computes in f32 (quantizer boundary math — the
    # reference also trains fp32); an f32 unquantized baseline separates
    # the precision cost from the fake-quant cost
    dt_f32 = baseline(jnp.float32, "train_f32_ms_per_step_b32")

    q = out.get("train_qat_range_ms_per_step_b32") or out.get(
        "train_qat_warmup_ms_per_step_b32")
    if q:
        out["train_qat_overhead_vs_f32"] = round(q / 1e3 / dt_f32, 3)
        out["train_qat_overhead_vs_bf16"] = round(q / 1e3 / dt_bf16, 3)

    # merge into MEASURED.json (single source of truth)
    path = os.path.join(_REPO, "MEASURED.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc.update({k: v for k, v in out.items() if k != "rpc_floor_ms"})
    doc.setdefault("provenance", {})["train_*"] = (
        "tools/bench_train.py: composite jitted step (fwd+bwd+GETA "
        f"update), ViT-B/16 batch {BATCH}, steady-phase chain of {ITERS}")
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
