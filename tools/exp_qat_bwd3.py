"""Round-5 QAT forensics part 2: reproduce the scalar-grad blow-up in a
micro setting and bench the Pallas fused backward standalone.

exp_qat_bwd2.py: the +107 ms is entirely the activation quantizers'
(d, q_m, t) scalar-gradient reductions, yet HLO cost analysis prices the
delta at ~2 GB / 0.2G transcendentals — the reduction fusions must run at
a tiny fraction of spec rate. This isolates:

  A. lsfq_nonlinear full VJP standalone (scalars + gx all consumed via
     SGD-style update — NOT sliced), fc2-input shape
  B. same but composed with a matmul (quant -> dot -> loss), grads to
     (x, W, d, q_m, t)
  C. the Pallas one-pass backward (ops/quant_vjp.py) standalone
  D. B with stop_gradient on (d, q_m, t) — the micro control

Usage (chip): python tools/exp_qat_bwd3.py
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
M, D = 6304, 3072


def main():
    from quantized_vit_tpu.quant import lsfq_nonlinear
    from quantized_vit_tpu.ops.quant_vjp import lsfq_nonlinear_bwd_fused

    floor = measure_floor()
    print(json.dumps({"rpc_floor_ms": round(floor * 1e3, 1)}), flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32) * 0.5)
    w0 = jnp.asarray(rng.standard_normal((D, 256)).astype(np.float32) * 0.02)
    clip = jnp.array([-2.0, 2.0], jnp.float32)
    d0 = jnp.float32(0.02)
    qm0 = jnp.float32(1.5)
    t0 = jnp.float32(1.0)

    def run(name, chain, *args):
        dt = max((timeit(chain, *args) - floor) / ITERS, 1e-9)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3)}),
              flush=True)

    # A: standalone full VJP, all grads consumed
    @jax.jit
    def chain_a(x, d, qm, t):
        def body(i, carry):
            x, d, qm, t, acc = carry
            def f(x, d, qm, t):
                return jnp.sum(lsfq_nonlinear(x, d, qm, t, clip, 0.0))
            L, (gx, gd, gqm, gt) = jax.value_and_grad(
                f, argnums=(0, 1, 2, 3))(x, d, qm, t)
            return (x - 1e-9 * gx, d - 1e-9 * gd, qm - 1e-9 * gqm,
                    t - 1e-9 * gt, acc + L)
        *_, acc = jax.lax.fori_loop(
            0, ITERS, body, (x, d, qm, t, jnp.float32(0)))
        return acc
    run("A standalone full VJP", chain_a, x0, d0, qm0, t0)

    # B: composed with a dot
    @jax.jit
    def chain_b(x, w, d, qm, t):
        def body(i, carry):
            x, w, d, qm, t, acc = carry
            def f(x, w, d, qm, t):
                y = lsfq_nonlinear(x, d, qm, t, clip, 0.0)
                return jnp.sum(jnp.square(y @ w)) * 1e-6
            L, (gx, gw, gd, gqm, gt) = jax.value_and_grad(
                f, argnums=(0, 1, 2, 3, 4))(x, w, d, qm, t)
            return (x - 1e-9 * gx, w - 1e-9 * gw, d - 1e-9 * gd,
                    qm - 1e-9 * gqm, t - 1e-9 * gt, acc + L)
        *_, acc = jax.lax.fori_loop(
            0, ITERS, body, (x, w, d, qm, t, jnp.float32(0)))
        return acc
    run("B composed quant->dot", chain_b, x0, w0, d0, qm0, t0)

    # D: composed, scalars stopped
    @jax.jit
    def chain_d(x, w, d, qm, t):
        def body(i, carry):
            x, w, acc = carry
            def f(x, w):
                y = lsfq_nonlinear(x, jax.lax.stop_gradient(d),
                                   jax.lax.stop_gradient(qm),
                                   jax.lax.stop_gradient(t), clip, 0.0)
                return jnp.sum(jnp.square(y @ w)) * 1e-6
            L, (gx, gw) = jax.value_and_grad(f, argnums=(0, 1))(x, w)
            return (x - 1e-9 * gx, w - 1e-9 * gw, acc + L)
        *_, acc = jax.lax.fori_loop(
            0, ITERS, body, (x0, w0, jnp.float32(0)))
        return acc
    run("D composed, scalars stopped", chain_d, x0, w0, d0, qm0, t0)

    # C: Pallas one-pass backward standalone
    g0 = jnp.ones((M, D), jnp.float32)

    @jax.jit
    def chain_c(x, g):
        def body(i, carry):
            x, acc = carry
            gx, gd, gqm, gt = lsfq_nonlinear_bwd_fused(
                x, g, d0, qm0, t0, clip_lo=-2.0, clip_hi=2.0)
            return (x - 1e-9 * gx, acc + gd + gqm + gt)
        x, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc + x[0, 0]
    run("C pallas fused bwd standalone", chain_c, x0, g0)


if __name__ == "__main__":
    main()
