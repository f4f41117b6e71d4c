"""Isolate VPU epilogue costs in the fused fc1 kernel and test cheap variants.

Usage: python tools/exp_epilogue.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.profile_serving import profile_device_times
from quantized_vit_tpu.ops.fused import fused_quant_matmul
from quantized_vit_tpu.quant.packing import pack_int4

M, K, N = 1664, 768, 3072
BM = 208


def variant_kernel(x_ref, w_ref, o_ref, lo_ref, hi_ref, *, mode: str):
    kh = K // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        p = w_ref[:].astype(jnp.int32)
        lo_ref[:] = ((p << 28) >> 28).astype(jnp.int8)
        hi_ref[:] = (p >> 4).astype(jnp.int8)

    lv = x_ref[:]
    acc = jax.lax.dot_general(lv[:, :kh], lo_ref[:],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(lv[:, kh:], hi_ref[:],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * 1e-3
    inv_d = jnp.float32(20.0)
    if mode == "none":
        o_ref[:] = y.astype(jnp.int8)
    elif mode == "quant_round":
        lvq = jnp.clip(jnp.round(y * inv_d), -7, 7)
        o_ref[:] = lvq.astype(jnp.int8)
    elif mode == "quant_magic":
        magic = jnp.float32(1.5 * 2**23)
        lvq = jnp.clip((y * inv_d + magic) - magic, -7, 7)
        o_ref[:] = lvq.astype(jnp.int8)
    elif mode == "gelu7_split":
        # split the block into 4 row sub-blocks; issue sub-dot i+1 before
        # epilogue i so the scheduler can overlap MXU and VPU
        from quantized_vit_tpu.ops.fused import _gelu_f32
        h = BM // 4
        magic = None
        def ep(acc):
            g = _gelu_f32(acc.astype(jnp.float32) * 1e-3)
            return jnp.clip(jnp.round(g * inv_d), -7, 7).astype(jnp.int8)
        def sub_dot(i):
            lvi = lv[i * h:(i + 1) * h]
            a = jax.lax.dot_general(lvi[:, :kh], lo_ref[:],
                                    dimension_numbers=(((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return a + jax.lax.dot_general(
                lvi[:, kh:], hi_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        nxt = sub_dot(0)
        for i in range(4):
            cur = nxt
            if i + 1 < 4:
                nxt = sub_dot(i + 1)
            o_ref[i * h:(i + 1) * h, :] = ep(cur)
        return
    elif mode in ("gelu10", "gelu5", "gelu_sig"):
        if mode == "gelu10":
            from quantized_vit_tpu.ops.fused import _gelu_f32
            g = _gelu_f32(y)
        elif mode == "gelu5":
            # degree-9 odd erf poly (5 coefs), |err| ~ 1e-4 on [-3, 3]
            C = (1.128241e+00, -3.7356343e-01, 1.0320428e-01,
                 -1.6230284e-02, 1.0670409e-03)
            v = jnp.clip(y * (2.0 ** -0.5), -3.0, 3.0)
            v2 = v * v
            acc2 = jnp.float32(C[-1])
            for c in C[-2::-1]:
                acc2 = acc2 * v2 + jnp.float32(c)
            erf = jnp.clip(acc2 * v, -1.0, 1.0)
            g = y * 0.5 * (1.0 + erf)
        else:
            g = y * jax.nn.sigmoid(1.702 * y)
        magic = jnp.float32(1.5 * 2**23)
        lvq = jnp.clip((g * inv_d + magic) - magic, -7, 7)
        o_ref[:] = lvq.astype(jnp.int8)


def run(mode, sem):
    rng = np.random.default_rng(0)
    x = jnp.array(rng.integers(-7, 8, (M, K)), jnp.int8)
    w = pack_int4(jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8), axis=0)
    f = pl.pallas_call(
        functools.partial(variant_kernel, mode=mode),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((K // 2, N), jnp.int8),
                        pltpu.VMEM((K // 2, N), jnp.int8)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )
    g = jax.jit(lambda x: f(x, w))
    r = profile_device_times(g, x, tag=f"ep_{mode}_{sem}")
    for k in r:
        if "variant" in k or "kernel" in k:
            return r[k][0]
    # fall back: max entry
    return max(v[0] for v in r.values())


def main():
    print(f"M={M} K={K} N={N} bm={BM}  ideal={2*M*K*N/394e12*1e6:.1f}us")
    for sem in ("arbitrary",):
        for mode in ("none", "gelu10", "gelu7_split"):
            t = run(mode, sem)
            print(f"{sem:9s} {mode:12s} {t:7.1f} us")


if __name__ == "__main__":
    main()
