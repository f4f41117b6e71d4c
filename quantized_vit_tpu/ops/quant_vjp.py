"""Fused single-pass backward for the LSFQ nonlinear quantizer.

WHY (measured, tools/exp_train_decomp.py + /tmp probes, v5e): the QAT
training step costs 158.9 ms vs 49.3 f32, and the entire +107 ms is the
activation quantizers' (d, q_m, t) gradient chains — replacing them with
STE-only backward recovers 52.7 ms, XLA's cost model prices the chains at
only ~25-40 ms, and the per-quantizer VJP is ~50 us in isolation. The
composed XLA backward materializes the intermediate chain
(input_pow / gd / gqm / gt, quant/lsfq.py:_nonlinear_bwd) at ~420 GB/s
effective. This kernel computes the ENTIRE backward in one read of
(x, g): grad_x (clipped STE) written tile by tile, and the three scalar
reductions accumulated in SMEM across grid steps — the minimum possible
traffic (2 reads + 1 write of the tensor, 3 scalars out).

Numerics: same formulas and mask precedence as the jnp backward
(reference: quant_layers.py:71-125); the only difference is f32
reduction ORDER (per-tile partials summed sequentially), which moves
grad_d/q_m/t by float rounding only — parity-tested against the jnp
implementation (tests/ops/test_quant_vjp.py).

Used by :func:`quantized_vit_tpu.quant.lsfq.lsfq_nonlinear_fused` (a
custom_vjp with this kernel as the TPU backward and the jnp chain as the
CPU fallback), which ``models/layers.py`` routes to when
``QuantConfig.fused_vjp`` is enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile rows: (x, g, gx) double-buffered (6 tiles) + ~8 f32 stack
# temporaries Mosaic materializes for the elementwise chain
# (input_pow/gd/gqm/gt/...) — a 6-tile-only model OOM'd scoped VMEM
# at [3072, 768] (19.3 MB vs the 16 MB limit)
_BWD_VMEM_BUDGET = 12 * 2**20

_EPS = 1e-6   # matches quant/lsfq.py
_LOG_GUARD = 1e-30


def _bwd_kernel(x_ref, g_ref, s_ref, gx_ref, part_ref,
                acc_d, acc_qm, acc_t, *,
                clip_lo: float, clip_hi: float, q_s: float, m_real: int,
                bm: int):
    """One [bm, N] tile: grad_x out + partial (d, q_m, t) reductions.

    s_ref: SMEM [3] runtime scalars (d, q_m, t). part_ref: VMEM [3, 128]
    output, row r lane 0 = partial r, written at the last grid step.
    Zero-padded rows contribute nothing: the wrapper pads g with zeros
    and every partial term is a multiple of g."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_d[0] = jnp.float32(0)
        acc_qm[0] = jnp.float32(0)
        acc_t[0] = jnp.float32(0)

    x = x_ref[:]
    g = g_ref[:]
    d = s_ref[0]
    q_m = s_ref[1]
    t = s_ref[2]

    x_abs = jnp.abs(x)
    sgn = jnp.sign(x)

    # rows beyond m_real are padding: zero g so every term vanishes there
    if m_real < n_steps * bm:
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
        g = jnp.where(row + i * bm < m_real, g, 0.0)

    range_abs = jnp.abs(q_m - q_s) + _EPS
    log_range = jnp.log(range_abs)
    range_pow = jnp.exp(t * log_range)
    range_pow_low = jnp.exp((t - 1.0) * log_range)
    log_in = jnp.log(jnp.maximum(x_abs - q_s, _LOG_GUARD))
    input_pow = jnp.exp(t * log_in)

    # d gradient: rounding residual (mask precedence as lsfq.py:94-99)
    gd = jnp.round(input_pow / d) - input_pow / d
    gd = jnp.where(x_abs >= q_m, jnp.round(range_pow / d) - range_pow / d,
                   gd)
    gd = jnp.where(x_abs <= q_s, 0.0, gd)
    pd = jnp.sum(g * sgn * gd)

    # q_m gradient: only strictly above q_m (lsfq.py:101-103)
    gqm = jnp.where(x_abs <= q_m, 0.0, sgn * (t * range_pow_low))
    pqm = jnp.sum(g * gqm)

    # t gradient (lsfq.py:105-109)
    gt = input_pow * log_in
    gt = jnp.where(x_abs >= q_m, range_pow * log_range, gt)
    gt = jnp.where(x_abs <= q_s, 0.0, gt)
    pt = jnp.sum(g * sgn * gt)

    acc_d[0] = acc_d[0] + pd
    acc_qm[0] = acc_qm[0] + pqm
    acc_t[0] = acc_t[0] + pt

    # clipped STE input gradient (lsfq.py:92)
    gx_ref[:] = jnp.where((x >= clip_hi) | (x <= clip_lo), 0.0, g)

    @pl.when(i == n_steps - 1)
    def _emit():
        part_ref[0, :] = jnp.full((128,), acc_d[0], jnp.float32)
        part_ref[1, :] = jnp.full((128,), acc_qm[0], jnp.float32)
        part_ref[2, :] = jnp.full((128,), acc_t[0], jnp.float32)


def quant_bwd_fits(n: int) -> bool:
    """The kernel needs a lane-aligned trailing dim (fall back to the jnp
    backward otherwise — e.g. UltraNet's narrow conv channels) AND a
    trailing dim narrow enough that even the minimum 8-row tile fits the
    VMEM budget (ADVICE r4 #5: an extreme n must route to the jnp chain
    up front, not die in a Mosaic compile error)."""
    return n % 128 == 0 and 8 * n * 4 * (3 * 2 + 8) <= _BWD_VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("clip_lo", "clip_hi", "q_s", "interpret"),
)
def lsfq_nonlinear_bwd_fused(x, g, d, q_m, t, *,
                             clip_lo: float, clip_hi: float,
                             q_s: float = 0.0,
                             interpret: bool = False):
    """(grad_x, grad_d, grad_qm, grad_t) in ONE pass over (x, g).

    x, g: same shape, any rank; trailing dim must satisfy
    :func:`quant_bwd_fits`. d, q_m, t: runtime scalars (learnable).
    clip_lo/hi, q_s: static per-layer config constants (QuantConfig
    weight_clip/act_clip — compile-time immediates, the serving kernels'
    lesson #1). Returns grad_x with x's shape and three f32 scalars."""
    shape = x.shape
    n = shape[-1]
    if not quant_bwd_fits(n):
        raise ValueError(f"lsfq_nonlinear_bwd_fused needs trailing dim % "
                         f"128 == 0, got {n} (use the jnp backward)")
    m = 1
    for s in shape[:-1]:
        m *= s
    x2 = x.reshape(m, n).astype(jnp.float32)
    g2 = g.reshape(m, n).astype(jnp.float32)

    budget = _BWD_VMEM_BUDGET
    bm = 1024
    while bm > 8 and bm * n * 4 * (3 * 2 + 8) > budget:
        bm //= 2
    if bm * n * 4 * (3 * 2 + 8) > budget:
        # unreachable through quant_bwd_fits-gated callers; a loud error
        # beats a Mosaic compile failure for direct callers (ADVICE r4 #5)
        raise ValueError(
            f"trailing dim {n} too wide for the fused backward even at "
            f"the minimum 8-row tile ({8 * n * 4 * 14 / 2**20:.1f} MB > "
            f"{budget / 2**20:.0f} MB VMEM budget); use the jnp backward")
    mp = -(-m // bm) * bm
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
        g2 = jnp.pad(g2, ((0, mp - m), (0, 0)))

    scalars = jnp.stack([jnp.asarray(d, jnp.float32).reshape(()),
                         jnp.asarray(q_m, jnp.float32).reshape(()),
                         jnp.asarray(t, jnp.float32).reshape(())])

    gx, parts = pl.pallas_call(
        functools.partial(_bwd_kernel, clip_lo=float(clip_lo),
                          clip_hi=float(clip_hi), q_s=float(q_s),
                          m_real=m, bm=bm),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, n), jnp.float32),
            jax.ShapeDtypeStruct((3, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=25 * mp * n,
            bytes_accessed=3 * mp * n * 4,
            transcendentals=3 * mp * n,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, g2, scalars)

    gx = gx[:m].reshape(shape).astype(x.dtype)
    return gx, parts[0, 0], parts[1, 0], parts[2, 0]
