"""Forward-bisect: start from the lean fc1 replica (exp_pro.py ln_quant,
134us) and add production features one at a time to find the ~50us gap to
the production kernel (nobias 200us).

  lean        ln_quant prologue, scalar scale, no bias, const quant params
  +vscale     scale as a [1, N] VMEM ref (production plumbing)
  +bias       bias as a [1, N] VMEM ref + add
  +smem       act_d/act_top/out_d/out_top from SMEM scalars
  +ln_refs    ln gamma/beta from [1, K] VMEM refs (lean already has these)
  +folded     production's _gelu_quant_folded form + _quantize_f32 helpers

Usage: python tools/exp_pro2.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.time_kernels import timeit_chain
from quantized_vit_tpu.ops.fused import (_ERF_COEFS, _gelu_quant_folded,
                                         _layernorm_f32, _quantize_f32)

M, K, N = 7168, 768, 3072
BM = 224
IDEAL = 2 * M * K * N / 394e12 * 1e6
S = 4


def _erf(v2, v):
    acc = jnp.float32(_ERF_COEFS[-1])
    for c in _ERF_COEFS[-2::-1]:
        acc = acc * v2 + jnp.float32(c)
    return acc * v


_SMEM_MODES = ("smem", "folded", "smem_hoist", "smem_unused")


def kernel(x_ref, w_ref, g_ref, b_ref, *rest, mode: str):
    it = iter(rest)
    sc_ref = next(it) if mode in ("vscale", "bias") + _SMEM_MODES else None
    bias_ref = next(it) if mode in ("bias",) + _SMEM_MODES else None
    if mode in _SMEM_MODES:
        act_d, act_top, out_d, out_top = next(it), next(it), next(it), next(it)
    o_ref = next(it)
    if mode == "smem_hoist":
        a_top_f = act_top[0].astype(jnp.float32)
        a_top_n = -a_top_f
        o_top_f = out_top[0].astype(jnp.float32)
        o_top_n = -o_top_f

    d_inv = jnp.float32(20.0)
    c2 = jnp.float32(2.0**-0.5)

    def make_lv(rows):
        if mode == "folded":
            xx = _layernorm_f32(x_ref[rows, :], g_ref[0], b_ref[0], 1e-6,
                                k_real=K)
            return _quantize_f32(xx, act_d[0], jnp.float32(1.0), act_top[0],
                                 False, folded=True)
        x32 = x_ref[rows, :].astype(jnp.float32)
        inv_k = 1.0 / K
        mu = jnp.sum(x32, axis=-1, keepdims=True) * inv_k
        m2 = jnp.sum(x32 * x32, axis=-1, keepdims=True) * inv_k
        var = jnp.maximum(m2 - mu * mu, 0.0)
        x32 = (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * g_ref[0] + b_ref[0]
        if mode == "smem":
            top_f = act_top[0].astype(jnp.float32)
            return jnp.clip(jnp.round(x32), -top_f, top_f).astype(jnp.int8)
        if mode == "smem_hoist":
            return jnp.clip(jnp.round(x32), a_top_n, a_top_f).astype(jnp.int8)
        return jnp.clip(jnp.round(x32), -7, 7).astype(jnp.int8)

    def dot(lv, cs):
        return jax.lax.dot_general(
            lv, w_ref[:, cs], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def finish(acc, cs):
        if mode == "lean":
            y = acc.astype(jnp.float32) * 1e-3
        else:
            y = acc.astype(jnp.float32) * sc_ref[:, cs]
        if mode in ("bias", "smem", "folded"):
            y = y + bias_ref[:, cs]
        if mode == "folded":
            # production: scale/bias prefolded with 1/sqrt2; y IS z
            o_ref[:, cs] = _gelu_quant_folded(y, out_d[0], out_top[0])
            return
        z = jnp.clip(y * c2, -3.0, 3.0)
        e = _erf(z * z, z)
        w = z * (2.0**0.5 * 0.5) * d_inv
        r = jnp.round(w + w * e)
        if mode == "smem":
            top_f = out_top[0].astype(jnp.float32)
            o_ref[:, cs] = jnp.clip(r, -top_f, top_f).astype(jnp.int8)
        elif mode == "smem_hoist":
            o_ref[:, cs] = jnp.clip(r, o_top_n, o_top_f).astype(jnp.int8)
        else:
            o_ref[:, cs] = jnp.clip(r, -7, 7).astype(jnp.int8)

    sub = N // S
    cols = [slice(s * sub, (s + 1) * sub) for s in range(S)]
    lv = make_lv(slice(0, BM))
    accs = {0: dot(lv, cols[0])}
    for s in range(S):
        if s + 1 < S:
            accs[s + 1] = dot(lv, cols[s + 1])
        finish(accs.pop(s), cols[s])


def run(mode):
    rng = np.random.default_rng(0)
    x = jnp.array(rng.standard_normal((M, K)) * 2.0, jnp.bfloat16)
    w = jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8)
    g = jnp.ones((1, K), jnp.float32) * 20.0
    b = jnp.zeros((1, K), jnp.float32)
    vm = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((BM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        vm((K, N)), vm((1, K)), vm((1, K)),
    ]
    operands = [w, g, b]
    if mode in ("vscale", "bias") + _SMEM_MODES:
        in_specs.append(vm((1, N)))
        operands.append(jnp.full((1, N), 1e-3, jnp.float32))
    if mode in ("bias",) + _SMEM_MODES:
        in_specs.append(vm((1, N)))
        operands.append(jnp.array(
            rng.standard_normal((1, N)) * 0.01, jnp.float32))
    if mode in _SMEM_MODES:
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs += [smem(), smem(), smem(), smem()]
        operands += [jnp.full((1,), 0.05, jnp.float32),
                     jnp.full((1,), 7, jnp.int32),
                     jnp.full((1,), 0.05, jnp.float32),
                     jnp.full((1,), 7, jnp.int32)]
    f = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(M // BM,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    dt = timeit_chain(
        lambda x: f(x, *operands)[0, 0].astype(jnp.float32), x)
    print(f"{mode:8s}: {dt*1e6:7.1f} us ({IDEAL/(dt*1e6)*100:4.1f}%)",
          flush=True)


def main():
    for mode in ("smem_hoist", "smem_unused"):
        run(mode)


if __name__ == "__main__":
    main()
