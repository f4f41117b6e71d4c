"""Pallas TPU kernel: packed-INT4 weight x INT8 activation matmul.

The hot op of the framework (BASELINE.json north star): replaces the
reference's float fake-quant forward (quant_layers.py:495-499,
quant_ultra.py:85-89) with a real integer MXU matmul:

- weights live in HBM as packed int4 (two nibbles per int8 byte along the
  contraction dim, halves layout — see quant/packing.py), halving weight
  bandwidth vs int8 and quartering it vs bf16;
- activations enter as int8 integer levels;
- in-kernel unpack is two arithmetic nibble shifts (VPU, lane-local), and the
  matmul runs as TWO half-K int8 MXU dots (one per nibble half) so no
  concatenation/shuffle is needed:
      acc = x[:, :K/2] @ sext(p << 4 >> 4)  +  x[:, K/2:] @ sext(p >> 4)
- the dequant epilogue ``acc * scale + bias`` is fused in-register before the
  single f32 store (scale = d_w * d_a, optionally per-output-channel; bias
  absorbs layer bias / folded BN).

Grid is (M/TM, N/TN) with the full K resident per program — ViT-B/16 shapes
(K in {768, 3072}) fit comfortably: x tile TMxK int8 + w tile (K/2)xTN int8
+ f32 out tile is < 2 MB of VMEM at TM=TN=256.

Speed of light: this kernel is MXU-bound for all ViT shapes (arithmetic
intensity ~2*M vs the few-bytes/flop the int4+int8 operands need), so the
target is the chip's int8 matmul roofline; bench.py measures achieved vs
peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import int4_matmul_ref, int8_matmul_ref


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _auto_blocks(mp: int, kp: int, np_: int, out_bytes: int,
                 x_bytes: int = 1, budget: int = 8 * 2**20) -> tuple[int, int]:
    """Pick (block_m, block_n) maximizing tile size within a VMEM budget.

    Empirically on v5e the fastest configuration is the largest tile that
    fits: fewer programs means x is streamed once and the MXU pipeline stays
    full (a whole ViT-B layer fits in one program at batch<=16). Budget
    accounts x (bm*kp), packed w (kp/2*bn), unpacked scratch (kp*bn), out
    (bm*bn*out_bytes), times 2 for double buffering of the streamed inputs.
    """
    def fits(bm, bn):
        x_b = bm * kp * x_bytes
        w_b = kp // 2 * bn + kp * bn
        o_b = bm * bn * out_bytes
        return 2 * (x_b + o_b) + w_b <= budget

    bn = np_
    while bn > 512 and not fits(32, bn):
        bn = _round_up(bn // 2, 128)
    bm = mp
    while bm > 32 and not fits(bm, bn):
        bm = _round_up(bm // 2, 32)
    return bm, bn


def _int4_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, w_lo_ref, w_hi_ref,
                 *, k_half: int, requant_top: int | None = None):
    # Grid is (n_tiles, m_tiles) with M innermost: the weight block and its
    # unpacked form stay resident across all M tiles of one N stripe, so the
    # nibble unpack runs once per weight block, not once per output tile.
    @pl.when(pl.program_id(1) == 0)
    def _unpack():
        # Mosaic has no int8 vector shifts; sign-extend nibbles via int32.
        p = w_ref[:].astype(jnp.int32)
        w_lo_ref[:] = ((p << 28) >> 28).astype(jnp.int8)  # low nibble rows
        w_hi_ref[:] = (p >> 4).astype(jnp.int8)  # high nibble rows

    acc = jax.lax.dot_general(
        x_ref[:, :k_half], w_lo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        x_ref[:, k_half:], w_hi_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if requant_top is None:
        o_ref[:] = out.astype(o_ref.dtype)
    else:
        # Fused requantization: emit the next layer's int8 levels directly,
        # saving an HBM round-trip of the f32 activations.
        o_ref[:] = jnp.clip(
            jnp.round(out), -float(requant_top), float(requant_top)
        ).astype(jnp.int8)


def _int8_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]
                + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "out_dtype", "requant_top",
                     "interpret"),
)
def int4_matmul(
    x_levels: jax.Array,
    w_packed: jax.Array,
    scale: jax.Array,
    bias: jax.Array | None = None,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    out_dtype=jnp.float32,
    requant_top: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``(x_levels @ unpack(w_packed)) * scale + bias`` on the MXU.

    Args:
      x_levels: [M, K] int8 activation levels (K even, = 2 * w_packed rows).
      w_packed: [K//2, N] int8 packed int4 weight levels.
      scale:    scalar or [N] f32 dequant scale (d_w * d_a).
      bias:     optional [N] f32 (layer bias / folded BN), added post-scale.
      block_m/block_n: output tile sizes (multiples of 32/128 preferred).
      requant_top: when set, fuse requantization into the epilogue — the
        kernel emits int8 levels ``clip(round(acc*scale+bias), -top, top)``
        directly (caller folds the next layer's 1/d_next into scale/bias),
        skipping an HBM round-trip of f32 activations between layers.

    Returns [M, N] ``out_dtype`` (int8 when ``requant_top`` is set).
    """
    if x_levels.dtype != jnp.int8 or w_packed.dtype != jnp.int8:
        raise TypeError("x_levels and w_packed must be int8")
    m, k = x_levels.shape
    k_half_in, n = w_packed.shape
    if k != 2 * k_half_in:
        raise ValueError(f"K mismatch: x has K={k}, w_packed has K//2={k_half_in}")

    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n,))
    bias = (
        jnp.zeros((n,), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32)
    )

    # Pad to hardware tiles. K pads to a multiple of 256 so each packed half
    # keeps int8 sublane alignment (128 packed rows); zero levels contribute
    # nothing to the accumulator.
    kp = _round_up(k, 256)
    out_bytes = 4 if requant_top is None else 1
    auto_m, auto_n = _auto_blocks(_round_up(m, 32), kp, _round_up(n, 128),
                                  out_bytes)
    block_m = auto_m if block_m is None else min(block_m, _round_up(m, 32))
    block_n = auto_n if block_n is None else min(block_n, _round_up(n, 128))
    mp = _round_up(m, block_m)
    np_ = _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x_levels = jnp.pad(x_levels, ((0, mp - m), (0, kp - k)))
    if (kp // 2, np_) != (k_half_in, n):
        # repack halves: unpacked rows [0..K) pad at the tail, but the packed
        # layout splits rows at K/2 — easiest correct path: unpack, pad, repack
        # at trace time (weights are static at serving time so XLA folds it).
        from ..quant.packing import unpack_int4, pack_int4

        w_full = unpack_int4(w_packed, axis=0)
        w_full = jnp.pad(w_full, ((0, kp - k), (0, np_ - n)))
        w_packed = pack_int4(w_full, axis=0)
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))
        bias = jnp.pad(bias, (0, np_ - n))

    # Grid (n, m): M innermost so the weight stripe (and its unpacked scratch)
    # is reused across M tiles; N outermost walks weight stripes once.
    grid = (np_ // block_n, mp // block_m)
    out_eltype = out_dtype if requant_top is None else jnp.int8
    out = pl.pallas_call(
        functools.partial(_int4_kernel, k_half=kp // 2,
                          requant_top=requant_top),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // 2, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_eltype),
        scratch_shapes=[
            pltpu.VMEM((kp // 2, block_n), jnp.int8),
            pltpu.VMEM((kp // 2, block_n), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ // 2 + mp * np_ * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_levels, w_packed, scale[None, :], bias[None, :])
    return out[:m, :n]


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "out_dtype", "interpret"),
)
def int8_matmul(
    x_levels: jax.Array,
    w_levels: jax.Array,
    scale: jax.Array,
    bias: jax.Array | None = None,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as :func:`int4_matmul` with unpacked int8 weights
    ([K, N] int8) — the W8 path and the attention score/AV building block."""
    if x_levels.dtype != jnp.int8 or w_levels.dtype != jnp.int8:
        raise TypeError("x_levels and w_levels must be int8")
    m, k = x_levels.shape
    k_w, n = w_levels.shape
    if k != k_w:
        raise ValueError(f"K mismatch: {k} vs {k_w}")

    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n,))
    bias = (
        jnp.zeros((n,), jnp.float32)
        if bias is None
        else jnp.asarray(bias, jnp.float32)
    )

    kp = _round_up(k, 128)
    auto_m, auto_n = _auto_blocks(_round_up(m, 32), kp, _round_up(n, 128), 4)
    block_m = auto_m if block_m is None else min(block_m, _round_up(m, 32))
    block_n = auto_n if block_n is None else min(block_n, _round_up(n, 128))
    mp = _round_up(m, block_m)
    np_ = _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x_levels = jnp.pad(x_levels, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w_levels = jnp.pad(w_levels, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))
        bias = jnp.pad(bias, (0, np_ - n))

    grid = (mp // block_m, np_ // block_n)
    out = pl.pallas_call(
        _int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_levels, w_levels, scale[None, :], bias[None, :])
    return out[:m, :n].astype(out_dtype)


def int4_matmul_xla(x_levels, w_packed, scale, bias=None, out_dtype=jnp.float32):
    """XLA fallback with identical semantics (non-TPU backends / debugging)."""
    acc = int4_matmul_ref(x_levels, w_packed)
    out = acc.astype(jnp.float32) * jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), (acc.shape[-1],)
    )
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)
    return out.astype(out_dtype)


def int8_matmul_xla(x_levels, w_levels, scale, bias=None, out_dtype=jnp.float32):
    """XLA fallback for the int8 path."""
    acc = int8_matmul_ref(x_levels, w_levels)
    out = acc.astype(jnp.float32) * jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), (acc.shape[-1],)
    )
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused activation-quantization variant: float x in, levels computed in VMEM
# ---------------------------------------------------------------------------


def _fa_quant(x, d_ref, t_ref, top_ref, act_pow: bool):
    """In-kernel LSFQ activation quantization (f32 math, int8 out).

    x: float tile. d/t scalars in SMEM; top = clamp level (also the >= q_m
    clamp: round(pow/d) > top only when |x| > q_m up to rounding, so a single
    min() reproduces the lsfq_levels masks for q_s = 0).
    """
    x = x.astype(jnp.float32)
    d = d_ref[0]
    top = top_ref[0].astype(jnp.float32)
    x_abs = jnp.abs(x)
    if act_pow:
        t = t_ref[0]
        p = jnp.exp(t * jnp.log(jnp.maximum(x_abs, 1e-30)))
    else:
        p = x_abs
    lv = jnp.minimum(jnp.round(p / d), top)
    return (jnp.sign(x) * lv).astype(jnp.int8)


def _int4_fa_kernel(x_ref, w_ref, scale_ref, bias_ref, d_ref, t_ref, top_ref,
                    o_ref, w_lo_ref, w_hi_ref, *, k_half: int, act_pow: bool):
    @pl.when(pl.program_id(1) == 0)
    def _unpack():
        p = w_ref[:].astype(jnp.int32)
        w_lo_ref[:] = ((p << 28) >> 28).astype(jnp.int8)
        w_hi_ref[:] = (p >> 4).astype(jnp.int8)

    lv = _fa_quant(x_ref[:], d_ref, t_ref, top_ref, act_pow)
    acc = jax.lax.dot_general(
        lv[:, :k_half], w_lo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        lv[:, k_half:], w_hi_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]
                + bias_ref[:]).astype(o_ref.dtype)


def _int8_fa_kernel(x_ref, w_ref, scale_ref, bias_ref, d_ref, t_ref, top_ref,
                    o_ref, *, act_pow: bool):
    lv = _fa_quant(x_ref[:], d_ref, t_ref, top_ref, act_pow)
    acc = jax.lax.dot_general(
        lv, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]
                + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "act_pow", "block_m", "block_n", "out_dtype",
                     "interpret"),
)
def quant_matmul_fa(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array | None,
    act_d: jax.Array,
    act_t: jax.Array,
    act_top: jax.Array,
    *,
    fmt: str = "int4",
    act_pow: bool = True,
    block_m: int | None = None,
    block_n: int | None = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Quantized matmul with FUSED activation quantization.

    x: [M, K] float (f32/bf16) — quantized to int8 LSFQ levels inside the
    kernel (one HBM read of x instead of quantize-pass + int8 rematerialize).
    w: packed int4 [K/2, N] (fmt='int4') or int8 [K, N] (fmt='int8').
    act_d/act_t/act_top: scalar activation quantizer constants.
    ``act_pow=False`` skips the x^t power map when the layer's t == 1
    (saves an exp+log per element; export sets this statically).
    """
    m, k = x.shape
    if fmt == "int4":
        k_w, n = w.shape[0] * 2, w.shape[1]
    else:
        k_w, n = w.shape
    if k != k_w:
        raise ValueError(f"K mismatch: x {k} vs w {k_w}")

    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n,))
    bias = (
        jnp.zeros((n,), jnp.float32) if bias is None
        else jnp.asarray(bias, jnp.float32)
    )

    kp = _round_up(k, 256 if fmt == "int4" else 128)
    x_bytes = x.dtype.itemsize
    out_bytes = jnp.dtype(out_dtype).itemsize
    auto_m, auto_n = _auto_blocks(_round_up(m, 32), kp,
                                  _round_up(n, 128), out_bytes,
                                  x_bytes=x_bytes)
    block_m = auto_m if block_m is None else min(block_m, _round_up(m, 32))
    block_n = auto_n if block_n is None else min(block_n, _round_up(n, 128))
    mp = _round_up(m, block_m)
    np_ = _round_up(n, block_n)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if fmt == "int4" and (kp // 2, np_) != (w.shape[0], n):
        from ..quant.packing import unpack_int4, pack_int4

        w_full = unpack_int4(w, axis=0)
        w_full = jnp.pad(w_full, ((0, kp - k), (0, np_ - n)))
        w = pack_int4(w_full, axis=0)
    elif fmt == "int8" and (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))
        bias = jnp.pad(bias, (0, np_ - n))

    grid = (np_ // block_n, mp // block_m)
    scalars = [
        jnp.asarray(act_d, jnp.float32).reshape(1),
        jnp.asarray(act_t, jnp.float32).reshape(1),
        jnp.asarray(act_top, jnp.int32).reshape(1),
    ]
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    common_specs = [
        pl.BlockSpec((block_m, kp), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(((kp // 2) if fmt == "int4" else kp, block_n),
                     lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        smem(), smem(), smem(),
    ]
    if fmt == "int4":
        kernel = functools.partial(_int4_fa_kernel, k_half=kp // 2,
                                   act_pow=act_pow)
        scratch = [
            pltpu.VMEM((kp // 2, block_n), jnp.int8),
            pltpu.VMEM((kp // 2, block_n), jnp.int8),
        ]
        w_bytes = kp * np_ // 2
    else:
        kernel = functools.partial(_int8_fa_kernel, act_pow=act_pow)
        scratch = []
        w_bytes = kp * np_

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=common_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x_bytes + w_bytes + mp * np_ * out_bytes,
            transcendentals=mp * kp * (2 if act_pow else 0),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, scale[None, :], bias[None, :], *scalars)
    return out[:m, :n]
