"""Wall-clock per-kernel timing on the real chip (profiler-free).

The axon tunnel has a ~22ms RPC floor and jax.profiler.trace hangs, so each
kernel is timed by chaining ITERS invocations inside ONE jit. Chain design
(each point learned the hard way on this tunnel):

- 1000 rolled fori_loop iterations so total device time (>=50ms) swamps the
  RPC floor jitter; compile cost does not scale (the loop body compiles once).
- the iteration dependency is an O(1) dynamic_update_slice poke of one input
  element with the previous output's scalar — a full-array `x + 0` carry add
  costs ~26us/iter of HBM traffic at [7168, 768] bf16 and inflates small
  kernels by 2x.
- the consumed scalar is jnp.sum(y) for XLA ops: consuming only y[0, 0]
  lets XLA's simplifier slice the dot to one output column (measured 6.4us
  for a 64us-ideal matmul). Pallas calls are opaque so y[0, 0] is safe — and
  sum(y) over a [7168, 3072] output would itself cost ~10us.

Emits a table: kernel | meas us | ideal us (roofline) | eff%, then one JSON
line. Usage: python tools/time_kernels.py [BATCH]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.ops import attention_qkv, fused_quant_matmul
from quantized_vit_tpu.quant.packing import pack_int4

ITERS = 1000
REPS = 3
PEAK_INT8 = 394e12
PEAK_BF16 = 197e12


def timeit_chain(step, x0, iters=ITERS, poke=None):
    """step(x) -> scalar f32. Returns seconds/iteration. ``poke(x, s)``
    feeds the scalar back into the next input (default: write into x[0, 0]
    cast to x.dtype — exact zero-cost for int inputs too since s is finite)."""
    if poke is None:
        def poke(x, s):
            upd = (s - s + jnp.ones((), jnp.float32)).astype(x.dtype)
            return jax.lax.dynamic_update_slice(
                x, upd.reshape((1,) * x.ndim), (0,) * x.ndim)

    @jax.jit
    def chain(x):
        def body(i, carry):
            x, acc = carry
            s = step(x)
            return (poke(x, s), acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    @jax.jit
    def empty(x):
        return jnp.sum(x)

    def run(fn, arg):
        float(fn(arg))
        float(fn(arg))
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            float(fn(arg))
            ts.append(time.time() - t0)
        return min(ts)

    floor = run(empty, jnp.ones((8,), jnp.float32))
    total = run(chain, x0)
    return max((total - floor) / iters, 1e-9)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m = batch * 224
    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    top = jnp.int32(7)
    scale = jnp.float32(1e-3)

    def mk(k, n):
        w = pack_int4(jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8), axis=0)
        bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
        return w, bias

    g768 = jnp.ones((768,), jnp.float32)
    b768 = jnp.zeros((768,), jnp.float32)

    rows = []

    def add(name, k, n, us, mult, peak=PEAK_INT8, m_rows=None):
        mm = m_rows if m_rows is not None else m
        ideal = 2 * mm * k * n / peak * 1e6
        rows.append({"kernel": name, "K": k, "N": n, "meas_us": round(us, 1),
                     "ideal_us": round(ideal, 1),
                     "eff": round(ideal / max(us, 1e-9), 3), "x": mult})
        print(f"[done] {name}: {us:.1f} us (ideal {ideal:.1f})", flush=True)

    # --- raw XLA matmul speed context (sum-consumed, see module doc) ---
    xb = jnp.array(rng.standard_normal((m, 768)) * 0.1, jnp.bfloat16)
    wb = jnp.array(rng.standard_normal((768, 2304)) * 0.1, jnp.bfloat16)
    dt = timeit_chain(lambda x: jnp.sum((x @ wb).astype(jnp.float32)), xb)
    add("xla bf16 qkv-shape", 768, 2304, dt * 1e6, 0, PEAK_BF16)

    xi = jnp.array(rng.integers(-7, 8, (m, 768)), jnp.int8)
    wi = jnp.array(rng.integers(-7, 8, (768, 2304)), jnp.int8)
    dt = timeit_chain(
        lambda x: jnp.sum(jax.lax.dot_general(
            x, wi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)).astype(jnp.float32), xi)
    add("xla int8 qkv-shape", 768, 2304, dt * 1e6, 0, PEAK_INT8)

    # --- serving kernels, bench configuration ---
    w, bias = mk(768, 2304)
    x = jnp.array(rng.standard_normal((m, 768)) * 0.1, jnp.bfloat16)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int4", prologue="ln_quant",
            act_d=d, act_t=t, act_top=top, ln_scale=g768, ln_bias=b768,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), x)
    add("qkv ln_quant", 768, 2304, dt * 1e6, 12)

    w, bias = mk(768, 768)
    res = jnp.array(rng.standard_normal((m, 768)) * 0.1, jnp.bfloat16)
    xl8 = jnp.array(rng.integers(-7, 8, (m, 768)), jnp.int8)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int4",
            prologue=None, epilogue="residual", residual=res,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), xl8)
    add("proj resid", 768, 768, dt * 1e6, 12)

    w, bias = mk(768, 3072)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int4", prologue="ln_quant",
            act_d=d, act_t=t, act_top=top, ln_scale=g768, ln_bias=b768,
            epilogue="gelu_quant", out_d=d, out_t=t, out_top=top,
        )[0, 0].astype(jnp.float32), x)
    add("fc1 ln+gelu", 768, 3072, dt * 1e6, 12)

    w, bias = mk(3072, 768)
    xl = jnp.array(rng.integers(-7, 8, (m, 3072)), jnp.int8)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int4",
            prologue=None, epilogue="residual", residual=res,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), xl)
    add("fc2 resid", 3072, 768, dt * 1e6, 12)

    # --- int8-stored (unpacked) weight variants: same int4 values, no
    # in-kernel nibble unpack, one dot instead of two ---
    def mk8(k, n):
        w = jnp.array(rng.integers(-7, 8, (k, n)), jnp.int8)
        bias = jnp.array(rng.standard_normal(n) * 0.01, jnp.float32)
        return w, bias

    w, bias = mk8(768, 2304)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int8", prologue="ln_quant",
            act_d=d, act_t=t, act_top=top, ln_scale=g768, ln_bias=b768,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), x)
    add("qkv ln_quant w8", 768, 2304, dt * 1e6, 0)

    w, bias = mk8(768, 768)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int8",
            prologue=None, epilogue="residual", residual=res,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), xl8)
    add("proj resid w8", 768, 768, dt * 1e6, 0)

    w, bias = mk8(768, 3072)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int8", prologue="ln_quant",
            act_d=d, act_t=t, act_top=top, ln_scale=g768, ln_bias=b768,
            epilogue="gelu_quant", out_d=d, out_t=t, out_top=top,
        )[0, 0].astype(jnp.float32), x)
    add("fc1 ln+gelu w8", 768, 3072, dt * 1e6, 0)

    w, bias = mk8(3072, 768)
    dt = timeit_chain(
        lambda x: fused_quant_matmul(
            x, w, scale, bias, fmt="int8",
            prologue=None, epilogue="residual", residual=res,
            out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32), xl)
    add("fc2 resid w8", 3072, 768, dt * 1e6, 0)

    # attention, both variants
    qkv = jnp.array(rng.standard_normal((batch, 224, 3 * 768)) * 0.1,
                    jnp.bfloat16)
    for ia in (False, True):
        dt = timeit_chain(
            lambda x, ia=ia: attention_qkv(
                x, heads=12, sm_scale=0.125, n_valid=197,
                out_d=d, out_t=t, out_top=top,
                int_attention=ia)[0, 0, 0].astype(jnp.float32), qkv)
        ideal_macs = batch * 12 * 224 * 208 * 64 * 2
        peak = PEAK_INT8 if ia else PEAK_BF16
        us = dt * 1e6
        ideal = 2 * ideal_macs / peak * 1e6
        rows.append({"kernel": f"attn {'int8' if ia else 'bf16'}",
                     "K": 0, "N": 0, "meas_us": round(us, 1),
                     "ideal_us": round(ideal, 1),
                     "eff": round(ideal / us, 3), "x": 12})
        print(f"[done] attn int={ia}: {us:.1f} us", flush=True)

    print(f"{'kernel':22s} {'K':>5s} {'N':>5s} {'meas us':>8s} "
          f"{'ideal us':>8s} {'eff':>6s}")
    tot = tot_ideal = 0.0
    for r in rows:
        print(f"{r['kernel']:22s} {r['K']:5d} {r['N']:5d} "
              f"{r['meas_us']:8.1f} {r['ideal_us']:8.1f} {r['eff']*100:5.1f}%")
        if r["x"] and r["kernel"] != "attn int8":
            tot += r["meas_us"] * r["x"]
            tot_ideal += r["ideal_us"] * r["x"]
    print(f"\nblock kernels x12 total: meas {tot:.0f} us, ideal {tot_ideal:.0f}"
          f" us, eff {tot_ideal/tot*100:.0f}% -> {batch/tot*1e6:.0f} img/s "
          "ceiling (no glue)")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
