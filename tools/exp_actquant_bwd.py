"""Microbenchmark: one activation-quantizer custom-VJP backward on chip.

tools/exp_train_decomp.py attributes ~107 ms of the 159 ms QAT step to
the ACTIVATION quantizers' backward (weights-only QAT is within 2.7 ms
of f32). ViT-B batch 32 has 37 activation-quantizer applications per
step (~110M elements total). This times lsfq_nonlinear's fwd and full
VJP at the two dominant shapes and divides: is the per-element cost
bandwidth-sane, and how much of it is the (d, q_m, t) reduction chains
vs the STE input gradient?

Variants per shape:
  fwd        — quantizer forward only
  vjp_full   — grads wrt (x, d, q_m, t); consumes one element of grad_x
               plus the three scalar reductions, so XLA slices most of
               the grad_x map away — this measures fwd + the REDUCTION
               chains (the honest full-VJP cost is bounded below by it)
  vjp_x      — grad wrt x only, one element consumed: DCE's to ~0 by
               construction (kept as the sanity floor)

Measured (v5e, fc2-input [6304, 3072]): fwd 52.6 us, vjp_full 50.2 us —
individually cheap; the model-level +107 ms (exp_train_decomp.py) is a
fusion/bandwidth property of the composed step, not of one quantizer.

Run on the chip: python tools/exp_actquant_bwd.py
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

ITERS = 30


def main():
    from quantized_vit_tpu.quant import lsfq_nonlinear

    floor = measure_floor()
    print(json.dumps({"rpc_floor_ms": round(floor * 1e3, 1)}), flush=True)

    clip = jnp.array([-2.0, 2.0], jnp.float32)
    d = jnp.float32(0.02)
    qm = jnp.float32(1.5)
    t = jnp.float32(1.0)

    def run(tag, shape):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        def fwd_loss(x, d, qm, t):
            return jnp.sum(lsfq_nonlinear(x, d, qm, t, clip, 0.0))

        grad_full = jax.grad(fwd_loss, argnums=(0, 1, 2, 3))
        grad_x = jax.grad(fwd_loss, argnums=(0,))

        def chain(step):
            @jax.jit
            def c(x):
                def body(i, carry):
                    xx, acc = carry
                    out = step(xx)
                    s = out if out.ndim == 0 else out.reshape(-1)[0]
                    xx = jax.lax.dynamic_update_slice(
                        xx, (s * 1e-30).reshape((1,) * xx.ndim)
                        .astype(xx.dtype) + xx[(slice(0, 1),) * xx.ndim],
                        (0,) * xx.ndim)
                    return xx, acc + s.astype(jnp.float32)
                _, acc = jax.lax.fori_loop(0, ITERS, body,
                                           (x, jnp.float32(0)))
                return acc
            return c

        row = {"shape": list(shape), "tag": tag}
        steps = {
            "fwd": lambda xx: jnp.sum(lsfq_nonlinear(xx, d, qm, t, clip,
                                                     0.0)),
            # consume ALL grads so nothing DCEs: sum of every component
            "vjp_full": lambda xx: (lambda g: g[0].reshape(-1)[0]
                                    + g[1] + g[2] + g[3])(
                                        grad_full(xx, d, qm, t)),
            "vjp_x": lambda xx: grad_x(xx, d, qm, t)[0].reshape(-1)[0],
        }
        for name, step in steps.items():
            dt = max((timeit(chain(step), x) - floor) / ITERS, 1e-9)
            row[f"{name}_us"] = round(dt * 1e6, 1)
        mb = x.size * 4 / 1e6
        row["MB"] = round(mb, 1)
        if row["vjp_full_us"] > 0:
            row["vjp_full_GBps_xg_only"] = round(
                2 * mb / 1e3 / (row["vjp_full_us"] / 1e6), 1)
        print(json.dumps(row), flush=True)

    run("fc2_in", (6304, 3072))
    run("qkv_in", (6304, 768))


if __name__ == "__main__":
    main()
