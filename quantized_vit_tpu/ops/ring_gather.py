"""In-kernel RDMA weight all-gather for FSDP serving (VERDICT r4 #2).

The round-4 audits showed every FSDP weight all-gather SYNCHRONOUS: XLA's
latency-hiding scheduler refuses to async-schedule manual shard_map
collectives across opaque Mosaic custom-calls (five compiler-flag variants
swept, async pairs 0 in all — tools/exp_overlap.py, docs/SCALING.md). The
TPU-native fix is to move the gather INSIDE the Pallas kernel: while block
i's MLP stripes run on the MXU, the same program pushes block i+1's weight
shards over ICI with ``pltpu.make_async_remote_copy``, so the scheduler
never gets a vote.

Sharding layout: **row shards** ([K/tp, N], ``P('model', None)``) rather
than the XLA FSDP path's column shards — Mosaic's DMA engine slices
destination buffers on the SUBLANE dim freely but rejects non-tile-aligned
LANE slices (measured: a [768, 2304] int8 gather destination sliced at
column 1152 fails to lower with "slice shape must be aligned to tiling
(128)" — the engine internally splits lane-dim copies). Row shards of a
packed int4 or int8 array concatenate back to the exact original bytes,
so the gathered weights are bit-identical either way.

Two entry points:

- :func:`gather_rows`: standalone push-all-gather of row-sharded arrays
  over a mesh axis (block 0's weights, and the unit-testable primitive).
  Each device pushes its own shard into every peer's output buffer at its
  row offset — a direct push, not a ring: per-block volume is tiny
  (~1.7 MB/device at ViT-B int4 tp=2) and tp is small, so (tp-1)
  concurrent pushes beat a ring's (tp-1) serialized hops.
- :func:`fused_mlp_gather`: the whole-MLP-block serving kernel
  (ops/fused.py:_fused_mlp_kernel — identical compute refs and numerics)
  that ALSO gathers a set of next-block weight shards while its stripe
  dots run. DMAs start at the first grid program, compute proceeds, and
  the final grid program waits on the send/recv semaphores so the
  gathered outputs are complete when the kernel retires.

Synchronization (the guide's collective-kernel pattern): a neighbor
barrier via :func:`pltpu.get_barrier_semaphore` runs before any remote
write — device A must not write into device B's output buffer until B has
entered the kernel (B's previous kernel may still own that memory).
Requires ``collective_id`` in CompilerParams; concurrent collective
kernels on the same mesh must use distinct ids.

The reference has no distributed code (single CUDA device — SURVEY.md
§2.4); this is TPU-native capability the scaling story needs, not a port.
Tested under TPU interpret mode (remote DMAs simulated on the virtual CPU
mesh — tests/ops/test_ring_gather.py) and AOT-compiled for real v5e
topologies (deviceless) in tools/scaling_report.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import _fused_mlp_kernel, _round_up

_ANY = pl.BlockSpec(memory_space=pl.ANY)


def _sublane(dtype) -> int:
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, 8)


def check_row_shards(shards: Sequence[jax.Array]) -> None:
    """Every shard's ROW count must be sublane-tile aligned (32 rows int8 /
    16 bf16 / 8 f32): the gather writes dst[my*R : (my+1)*R, :] and Mosaic
    requires tile-aligned sublane offsets."""
    for s in shards:
        sub = _sublane(s.dtype)
        if s.shape[0] % sub:
            raise ValueError(
                f"row shard rows {s.shape[0]} not a multiple of the "
                f"{jnp.dtype(s.dtype).name} sublane tile {sub}")


def _gather_start(shard_refs, out_refs, send_sems, recv_sems, *,
                  axis_name: str, tp: int):
    """Neighbor barrier, then issue every (shard -> out-row-slot) push."""
    my = jax.lax.axis_index(axis_name)
    if tp > 1:
        # no peers at tp=1, and get_barrier_semaphore itself requires a
        # communication context the single-device lowering doesn't set
        # ("Custom barrier sync flag is not set" — the tp=1 degenerate is
        # the single-chip overlap harness, tools/exp_rdma_overlap.py)
        barrier_sem = pltpu.get_barrier_semaphore()
        for s in range(1, tp):
            peer = jax.lax.rem(my + jnp.int32(s), jnp.int32(tp))
            pltpu.semaphore_signal(
                barrier_sem, inc=1, device_id={axis_name: peer},
                device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(barrier_sem, tp - 1)

    for j, (src, dst) in enumerate(zip(shard_refs, out_refs)):
        rows = src.shape[0]
        dst_my = dst.at[pl.ds(my * rows, rows), :]
        pltpu.make_async_copy(src, dst_my, recv_sems.at[j]).start()
        for s in range(1, tp):
            peer = jax.lax.rem(my + jnp.int32(s), jnp.int32(tp))
            pltpu.make_async_remote_copy(
                src_ref=src,
                dst_ref=dst_my,  # same row slot on the peer (my rows)
                send_sem=send_sems.at[j],
                recv_sem=recv_sems.at[j],
                device_id={axis_name: peer},
                device_id_type=pltpu.DeviceIdType.MESH,
            ).start()


def _gather_wait(shard_refs, out_refs, send_sems, recv_sems, *,
                 axis_name: str, tp: int):
    """Drain: per weight, the recv semaphore collects the local copy plus
    (tp-1) inbound remote writes (each of one shard's bytes — DMA
    semaphores count bytes, and .wait() decrements by the descriptor's
    byte count, so tp same-shaped waits drain it exactly); the send
    semaphore collects (tp-1) outbound completions."""
    my = jax.lax.axis_index(axis_name)
    for j, (src, dst) in enumerate(zip(shard_refs, out_refs)):
        rows = src.shape[0]
        dst_my = dst.at[pl.ds(my * rows, rows), :]
        for _ in range(tp):
            pltpu.make_async_copy(src, dst_my, recv_sems.at[j]).wait()
        for _ in range(tp - 1):
            pltpu.make_async_copy(src, dst_my, send_sems.at[j]).wait()


def _gather_rows_kernel(*refs, n_w: int, tp: int, axis_name: str):
    shard_refs = refs[:n_w]
    out_refs = refs[n_w:2 * n_w]
    send_sems, recv_sems = refs[2 * n_w], refs[2 * n_w + 1]
    _gather_start(shard_refs, out_refs, send_sems, recv_sems,
                  axis_name=axis_name, tp=tp)
    _gather_wait(shard_refs, out_refs, send_sems, recv_sems,
                 axis_name=axis_name, tp=tp)


@functools.partial(jax.jit, static_argnames=("axis_name", "tp",
                                             "collective_id", "interpret"))
def gather_rows(shards: Sequence[jax.Array], *, axis_name: str, tp: int,
                collective_id: int = 7, interpret=False):
    """Push-all-gather each row shard over ``axis_name`` (call inside
    shard_map). shards[j]: [R_j, N_j] -> [R_j * tp, N_j], tiled in axis
    order — identical to ``jax.lax.all_gather(x, axis, axis=0,
    tiled=True)`` (parity-tested)."""
    shards = list(shards)
    check_row_shards(shards)
    n_w = len(shards)
    out_shapes = [jax.ShapeDtypeStruct((s.shape[0] * tp, s.shape[1]),
                                       s.dtype) for s in shards]
    return pl.pallas_call(
        functools.partial(_gather_rows_kernel, n_w=n_w, tp=tp,
                          axis_name=axis_name),
        in_specs=[_ANY] * n_w,
        out_specs=[_ANY] * n_w,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_w,)),
                        pltpu.SemaphoreType.DMA((n_w,))],
        compiler_params=pltpu.CompilerParams(
            # a barrier (and so a collective_id) only exists at tp > 1
            collective_id=collective_id if tp > 1 else None),
        interpret=interpret,
    )(*shards)


# ---------------------------------------------------------------------------
# fused MLP + gather-next-block
# ---------------------------------------------------------------------------

_N_CORE_IN = 13  # x, w1, s1, b1, w2, s2, b2, ln_g, ln_b, 4 smem scalars


def _mlp_gather_kernel(*refs, n_w: int, tp: int, axis_name: str,
                       n_prog: int, mlp_kw: dict):
    core_in = refs[:_N_CORE_IN]
    shard_refs = refs[_N_CORE_IN:_N_CORE_IN + n_w]
    o_ref = refs[_N_CORE_IN + n_w]
    gath_refs = refs[_N_CORE_IN + n_w + 1:_N_CORE_IN + 2 * n_w + 1]
    send_sems, recv_sems = refs[_N_CORE_IN + 2 * n_w + 1:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _start():
        _gather_start(shard_refs, gath_refs, send_sems, recv_sems,
                      axis_name=axis_name, tp=tp)

    # the block's normal MLP compute — identical refs/numerics to
    # ops/fused.py:_fused_mlp_kernel (the DMAs above ride the DMA/ICI
    # engines while the stripe dots occupy the MXU)
    _fused_mlp_kernel(*core_in, o_ref, **mlp_kw)

    @pl.when(i == n_prog - 1)
    def _finish():
        _gather_wait(shard_refs, gath_refs, send_sems, recv_sems,
                     axis_name=axis_name, tp=tp)


def fused_mlp_gather(
    x, w1, scale1, bias1, w2, scale2, bias2, *, ln_scale, ln_bias,
    next_shards: Sequence[jax.Array], axis_name: str, tp: int,
    ln_eps: float = 1e-6,
    act_d=None, act_t=None, act_top=None, act_pow: bool = False,
    hid_d=None, hid_t=None, hid_top=None, hid_pow: bool = False,
    fmt: str = "int8", out_dtype=jnp.bfloat16,
    block_m: int | None = None, stripes: int | None = None,
    collective_id: int = 7, interpret=False,
):
    """:func:`~.fused.fused_mlp` that also all-gathers ``next_shards``
    (the NEXT block's row-sharded weights) while its stripe dots run.

    Returns (mlp_out, [gathered_full_weights...]). Compute numerics are
    bit-identical to fused_mlp (same kernel body); the gather is
    bit-identical to ``jax.lax.all_gather(axis=0, tiled=True)``. Shard
    bytes are copied opaquely, so int8 level arrays and packed-int4 byte
    arrays both gather exactly.

    VMEM note: the gather moves HBM->HBM (shards and outputs live in the
    ANY memory space), so it costs no VMEM against the MLP's resident
    weights; only the DMA engines and ICI are occupied. The compute
    kernel itself is the unpacked-int8 serving configuration.
    """
    if not (isinstance(act_top, int) and act_top >= 1):
        raise ValueError(f"positive static act_top required, got {act_top!r}")
    if not (isinstance(hid_top, int) and hid_top >= 1):
        raise ValueError(f"positive static hid_top required, got {hid_top!r}")
    if fmt != "int8":
        raise ValueError(
            "fused_mlp_gather computes in the unpacked-int8 serving "
            f"format (got fmt={fmt!r}); gathered BYTES may be any format")
    shards = list(next_shards)
    check_row_shards(shards)
    m, k = x.shape
    hid = w1.shape[1]

    scale1 = jnp.broadcast_to(jnp.asarray(scale1, jnp.float32), (hid,))
    scale2 = jnp.broadcast_to(jnp.asarray(scale2, jnp.float32), (k,))
    bias1 = (jnp.zeros((hid,), jnp.float32) if bias1 is None
             else jnp.asarray(bias1, jnp.float32))
    bias2 = (jnp.zeros((k,), jnp.float32) if bias2 is None
             else jnp.asarray(bias2, jnp.float32))
    ln_scale = jnp.asarray(ln_scale, jnp.float32)
    ln_bias = jnp.asarray(ln_bias, jnp.float32)

    # constant folds, mirroring ops/fused.py:_fused_mlp exactly
    act_folded = not act_pow
    if act_folded:
        inv_d = 1.0 / jnp.asarray(act_d, jnp.float32)
        ln_scale = ln_scale * inv_d
        ln_bias = ln_bias * inv_d
    hid_folded = not hid_pow
    if hid_folded:
        scale1 = scale1 * jnp.float32(2.0**-0.5)
        bias1 = bias1 * jnp.float32(2.0**-0.5)

    from .fused import _mlp_auto_stripes, _mlp_resident_fits, _pick_bm

    n_stripes = stripes or _mlp_auto_stripes(hid)
    if hid % n_stripes:
        raise ValueError(f"stripes={n_stripes} does not divide {hid}")
    cap = _round_up(m, 32)
    fits = _mlp_resident_fits(k, hid, fmt, x.dtype.itemsize,
                              jnp.dtype(out_dtype).itemsize, n_stripes)
    bm = block_m or _pick_bm(cap, fits)
    mp = _round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    n_prog = mp // bm

    vm = lambda shape, idx: pl.BlockSpec(shape, idx,
                                         memory_space=pltpu.VMEM)
    in_specs = [
        vm((bm, k), lambda i: (i, 0)),
        vm((k, hid), lambda i: (0, 0)),
        vm((1, hid), lambda i: (0, 0)),
        vm((1, hid), lambda i: (0, 0)),
        vm((hid, k), lambda i: (0, 0)),
        vm((1, k), lambda i: (0, 0)),
        vm((1, k), lambda i: (0, 0)),
        vm((1, k), lambda i: (0, 0)),
        vm((1, k), lambda i: (0, 0)),
    ]
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs += [smem()] * 4
    n_w = len(shards)
    in_specs += [_ANY] * n_w

    operands = [
        x, w1, scale1[None, :], bias1[None, :], w2, scale2[None, :],
        bias2[None, :], ln_scale[None, :], ln_bias[None, :],
        jnp.asarray(act_d, jnp.float32).reshape(1),
        jnp.asarray(act_t if act_t is not None else 1.0,
                    jnp.float32).reshape(1),
        jnp.asarray(hid_d, jnp.float32).reshape(1),
        jnp.asarray(hid_t if hid_t is not None else 1.0,
                    jnp.float32).reshape(1),
        *shards,
    ]

    mlp_kw = dict(fmt=fmt, k_half=k // 2, h_half=hid // 2, k_real=k,
                  act_pow=act_pow, hid_pow=hid_pow, ln_eps=ln_eps,
                  act_top=act_top, hid_top=hid_top, n_stripes=n_stripes,
                  act_folded=act_folded, hid_folded=hid_folded)

    out_shapes = [jax.ShapeDtypeStruct((mp, k), out_dtype)] + [
        jax.ShapeDtypeStruct((s.shape[0] * tp, s.shape[1]), s.dtype)
        for s in shards
    ]
    out_specs = [pl.BlockSpec((bm, k), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] + [_ANY] * n_w

    outs = pl.pallas_call(
        functools.partial(_mlp_gather_kernel, n_w=n_w, tp=tp,
                          axis_name=axis_name, n_prog=n_prog,
                          mlp_kw=mlp_kw),
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_w,)),
                        pltpu.SemaphoreType.DMA((n_w,))],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * hid * k * 2,
            bytes_accessed=mp * k * (x.dtype.itemsize
                                     + jnp.dtype(out_dtype).itemsize)
            + (k * hid + hid * k)
            + 2 * sum(s.size * s.dtype.itemsize for s in shards),
            transcendentals=mp * hid,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            collective_id=collective_id if tp > 1 else None,
        ),
        interpret=interpret,
    )(*operands)
    out, gathered = outs[0], list(outs[1:])
    if mp != m:
        out = out[:m]
    return out, gathered
