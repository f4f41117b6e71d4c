"""fc1 epilogue experiments: isolate the GELU+quant VPU cost and test
cheaper formulations, timed with the poke-chain (tools/time_kernels).

Each variant is a standalone kernel at the bench fc1 shape (int8 levels in,
int8 weights in — isolates the EPILOGUE cost from prologue/unpack):

  none        dequant + int8 cast only (the epilogue floor)
  round       dequant + round/clip quant (the 'quant' epilogue)
  magic       same but round via the 1.5*2^23 magic-add trick
  gelu_erf    current production epilogue (5-coef weighted erf poly)
  gelu_magic  erf poly + magic rounding
  gelu_tanh   tanh-approx GELU (|err| vs exact erf-GELU ~1e-3) — tests
              whether Mosaic's tanh (EUP) beats 6 fma (VPU)
  gelu_sig    sigmoid-approx GELU (|err| ~1e-2)
  gelu_bf16   erf poly evaluated in bf16 (tests 2x-packed VPU math)

Usage: python tools/exp_fc1.py
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
from quantized_vit_tpu.ops.fused import _ERF_COEFS

M, K, N = 7168, 768, 3072
BM = 224
IDEAL = 2 * M * K * N / 394e12 * 1e6


def _erf(v2, v, f=jnp.float32):
    acc = f(_ERF_COEFS[-1])
    for c in _ERF_COEFS[-2::-1]:
        acc = acc * v2 + f(c)
    return acc * v


def _magic_round(x):
    magic = jnp.float32(1.5 * 2**23)
    return (x + magic) - magic


def kernel(x_ref, w_ref, o_ref, *, mode: str, n_stripes: int = 4):
    sub = N // n_stripes
    cols = [slice(s * sub, (s + 1) * sub) for s in range(n_stripes)]
    d_inv = jnp.float32(20.0)
    c2 = jnp.float32(2.0**-0.5)

    def dot(cs):
        return jax.lax.dot_general(
            x_ref[:], w_ref[:, cs],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def finish(acc, cs):
        y = acc.astype(jnp.float32) * 1e-3
        if mode == "none":
            o_ref[:, cs] = y.astype(jnp.int8)
        elif mode == "round":
            o_ref[:, cs] = jnp.clip(jnp.round(y * d_inv), -7, 7).astype(jnp.int8)
        elif mode == "magic":
            o_ref[:, cs] = jnp.clip(_magic_round(y * d_inv), -7, 7).astype(jnp.int8)
        elif mode in ("gelu_erf", "gelu_magic"):
            z = jnp.clip(y * c2, -3.0, 3.0)
            e = _erf(z * z, z)
            w = z * (2.0**0.5 * 0.5) * d_inv
            r = w + w * e
            r = jnp.round(r) if mode == "gelu_erf" else _magic_round(r)
            o_ref[:, cs] = jnp.clip(r, -7, 7).astype(jnp.int8)
        elif mode == "gelu_tanh":
            # 0.5*y*(1+tanh(0.7978845608*(y+0.044715*y^3)))
            y2 = y * y
            t = jnp.tanh(y * (0.7978845608 + 0.7978845608 * 0.044715 * y2))
            r = _magic_round(y * d_inv * 0.5 * (1.0 + t))
            o_ref[:, cs] = jnp.clip(r, -7, 7).astype(jnp.int8)
        elif mode == "gelu_sig":
            g = y * jax.nn.sigmoid(1.702 * y)
            r = _magic_round(g * d_inv)
            o_ref[:, cs] = jnp.clip(r, -7, 7).astype(jnp.int8)
        elif mode == "gelu_bf16":
            z = jnp.clip(y * c2, -3.0, 3.0).astype(jnp.bfloat16)
            e = _erf(z * z, z, f=jnp.bfloat16).astype(jnp.float32)
            w = y * (0.5 * d_inv)
            r = _magic_round(w + w * e)
            o_ref[:, cs] = jnp.clip(r, -7, 7).astype(jnp.int8)

    accs = {0: dot(cols[0])}
    for s in range(n_stripes):
        if s + 1 < n_stripes:
            accs[s + 1] = dot(cols[s + 1])
        finish(accs.pop(s), cols[s])


def run(mode, n_stripes=4):
    rng = np.random.default_rng(0)
    x = jnp.array(rng.integers(-7, 8, (M, K)), jnp.int8)
    w = jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8)
    f = pl.pallas_call(
        functools.partial(kernel, mode=mode, n_stripes=n_stripes),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    dt = timeit_chain(
        lambda x: f(x, w)[0, 0].astype(jnp.float32), x)
    print(f"{mode:11s} S={n_stripes}: {dt*1e6:7.1f} us "
          f"({IDEAL/(dt*1e6)*100:4.1f}% of ideal {IDEAL:.1f})", flush=True)
    return dt


def main():
    for mode in ("none", "round", "magic", "gelu_erf", "gelu_magic",
                 "gelu_tanh", "gelu_sig", "gelu_bf16"):
        run(mode)
    run("gelu_magic", n_stripes=8)
    run("gelu_magic", n_stripes=2)


if __name__ == "__main__":
    main()
