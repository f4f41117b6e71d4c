"""On-chip measurement of the fused quantizer-VJP kernel (QAT step).

Follow-up to tools/exp_train_decomp.py: the activation quantizers'
(d, q_m, t) gradient chains cost ~107 ms of the 159 ms QAT step (an
STE-only backward runs 52.7 ms). ops/quant_vjp.py computes the whole
backward in one pass of (x, g); this probe measures grad agreement between
the fused and chain backward on identical params, then times both full
fwd+bwd+SGD steps. (The max-rel-err metric reads ~8.8 on chip: the
worst leaves are per-layer grad_d scalars — sums of +-rounding
residuals that nearly cancel, so reduction order moves the tiny result
by a large RELATIVE factor; interpret-mode parity vs the jnp chain is
1e-5-tight, tests/ops/test_quant_vjp.py.)

MEASURED RESULT (v5e, 2026-08-21): the fused kernel is SLOWER end to
end — 176-181 vs 156-159 ms/step (two sessions) — because each of the 74 per-site
pallas_call boundaries forces (x, g) to be materialized to HBM and
grad_x re-read, traffic XLA's (inefficient but fused-into-neighbors)
chain avoids; the reduction-chain savings do not cover it at ViT-B
tensor sizes. QuantConfig.fused_vjp therefore defaults to False; the
kernel stays parity-tested (tests/ops/test_quant_vjp.py) as the
starting point for a future whole-backward-segment fusion.

Run on the chip: python tools/exp_fused_vjp.py
"""
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, 'tools'))
import numpy as np, jax, jax.numpy as jnp
import flax
from _bench_util import measure_floor, timeit
from quantized_vit_tpu.models import (QuantConfig, VisionTransformer,
                                      init_quant_params_tree)
from quantized_vit_tpu.models.vit import ViTConfig
from quantized_vit_tpu.utils.losses import cross_entropy_onehot_target, one_hot

BATCH, ITERS = 32, 10
rng = np.random.default_rng(0)
images = jnp.array(rng.standard_normal((BATCH,224,224,3))*0.5, jnp.float32)
labels = jnp.array(rng.integers(0,1000,BATCH))
floor = measure_floor()
print(json.dumps({"rpc_floor_ms": round(floor*1e3,1)}), flush=True)

def build(fused):
    # IMPORTANT: independent rng per build so both variants get IDENTICAL
    # params (the first probe run consumed one shared rng twice and
    # compared grads of different parameter draws)
    rng = np.random.default_rng(7)
    cfg = ViTConfig(num_classes=1000,
                    quant=QuantConfig(enabled=True, fused_vjp=fused))
    model = VisionTransformer(cfg)
    abstract = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), images[:1]))["params"]
    params = jax.tree.map(lambda s: jnp.array(rng.standard_normal(s.shape).astype(np.float32)*0.02),
                          flax.core.unfreeze(abstract))
    params = init_quant_params_tree(params, init_bits=8.0)
    def loss_fn(p, x, y):
        logits = model.apply({"params": p}, x, deterministic=True)
        return cross_entropy_onehot_target(logits, one_hot(y, 1000))
    @jax.jit
    def fb(params, images, labels):
        def body(i, carry):
            p, acc = carry
            Lv, grads = jax.value_and_grad(loss_fn)(p, images, labels)
            p = jax.tree.map(lambda a, g: a - 1e-3*g, p, grads)
            return p, acc + Lv
        p, acc = jax.lax.fori_loop(0, ITERS, body, (params, jnp.float32(0)))
        return acc + jax.tree.leaves(p)[0].reshape(-1)[0]
    return params, loss_fn, fb

# correctness on chip first: grads close between fused and unfused
pf, lf, fbf = build(True)
pu, lu, fbu = build(False)
gf = jax.jit(jax.grad(lf))(pf, images, labels)
gu = jax.jit(jax.grad(lu))(pu, images, labels)
errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b)) /
                                       (jnp.max(jnp.abs(b)) + 1e-12)), gf, gu)
worst = max(jax.tree.leaves(errs))
print(json.dumps({"max_rel_grad_err_fused_vs_chain_on_chip": worst}), flush=True)

for name, params, fb in (("qat_chain_vjp", pu, fbu), ("qat_fused_vjp", pf, fbf)):
    dt = max((timeit(fb, params, images, labels) - floor)/ITERS, 1e-9)
    print(json.dumps({"variant": name, "fwd_bwd_ms": round(dt*1e3,2)}), flush=True)
