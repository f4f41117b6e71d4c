"""Collectives audit + analytic ICI/DCN scaling model.

The reference has no distributed code at all (SURVEY.md §2.4); the build's
scaling targets come from BASELINE.md (>=85% images/s efficiency from 1
chip to N>=2 hosts, tensor-sharded, continuous batching). This module makes
that claim *quantitative*:

- :func:`collective_stats` parses the post-SPMD-partitioner HLO of a jitted
  function and returns every collective op with its shape and byte count —
  the exact communication GSPMD inserted for the chosen shardings. Works on
  the virtual CPU mesh (the partitioner emits the same collectives for the
  same mesh shape regardless of backend), so multi-chip communication
  volume is auditable without multi-chip hardware.
- :func:`predict_scaling` combines the audited bytes with an analytic
  ring-collective cost model over published v5e link bandwidths to predict
  step time and scaling efficiency at 1 chip -> N chips / M hosts.

Hardware model (TPU v5e, from public "How to Scale Your Model" numbers):
ICI: 2D torus, 45 GB/s per link per direction, 2 links usable per ring
direction on a pod slice axis. DCN: ~= 25 GB/s per host. A ring all-reduce
of S bytes over p devices moves 2*S*(p-1)/p bytes through each device's
ring bandwidth; all-gather/reduce-scatter move S*(p-1)/p.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_OP_RE = re.compile(
    r"=\s*(?:\(?([a-z]+\d*)\[([\d,]*)\])?[^=]*?"
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")


@dataclasses.dataclass
class CollectiveOp:
    kind: str
    dtype: str
    shape: Tuple[int, ...]
    bytes: int          # full-tensor size S for the ring model
    group_size: int = 0  # replica group size (0 = unknown -> caller's n_dev)


def collective_stats(fn, *args, static_argnames=None,
                     donate_argnums=None) -> List[CollectiveOp]:
    """All collectives in the COMPILED (post-partitioning) HLO of fn(*args).

    fn should already carry its shardings (NamedSharding'd inputs or
    in_shardings); run under `with mesh:` if it relies on the ambient mesh.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(
        fn, static_argnames=static_argnames)
    txt = jitted.lower(*args).compile().as_text()
    return parse_collectives(txt)


_GROUPS_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _replica_group_size(line: str) -> int:
    m = _GROUPS_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)  # iota form [n_groups, group_size]<=[N]
    if m:
        return int(m.group(2))
    return 0


def parse_collectives(hlo_text: str) -> List[CollectiveOp]:
    out: List[CollectiveOp] = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        dtype, dims, kind = m.group(1), m.group(2), m.group(3)
        if "-done(" in line:
            continue  # async pair: count the -start only
        if dtype is None:
            # tuple-shaped op: fall back to the first dtype[shape] in line
            m2 = re.search(r"([a-z]+\d*)\[([\d,]*)\]", line)
            if not m2:
                continue
            dtype, dims = m2.group(1), m2.group(2)
        shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
        nbytes = int(np.prod(shape, dtype=np.int64)) * _DTYPE_BYTES.get(
            dtype, 4) if shape else _DTYPE_BYTES.get(dtype, 4)
        group = _replica_group_size(line)
        if kind == "reduce-scatter":
            # the HLO result is ONE SHARD; the ring model wants the full
            # reduced tensor S = shard * group
            nbytes *= max(group, 1)
        out.append(CollectiveOp(kind, dtype, shape, nbytes, group))
    return out


def with_wire_dtype(ops: Sequence[CollectiveOp], *, kind: str,
                    from_dtype: str, to_dtype: str) -> List[CollectiveOp]:
    """Re-dtype ``kind`` ops audited at ``from_dtype`` to the byte count of
    ``to_dtype`` — the analytic correction for backend-dependent wire
    dtypes (VERDICT r4 #8): the virtual-CPU lowering promotes bf16
    reduce-scatters to f32 (2x bytes on the wire), while the scheduled
    TPU executable keeps bf16 (verified in the deviceless v5e audit,
    tools/scaling_report.py). Ops of other kinds/dtypes pass through."""
    ratio = _DTYPE_BYTES[to_dtype] / _DTYPE_BYTES[from_dtype]
    return [
        dataclasses.replace(op, dtype=to_dtype,
                            bytes=int(op.bytes * ratio))
        if op.kind == kind and op.dtype == from_dtype else op
        for op in ops
    ]


def summarize(ops: Sequence[CollectiveOp]) -> Dict[str, Dict[str, float]]:
    summary: Dict[str, Dict[str, float]] = {}
    for op in ops:
        s = summary.setdefault(op.kind, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += op.bytes
    return summary


# ---------------------------------------------------------------------------
# analytic time model
# ---------------------------------------------------------------------------

#: usable per-direction bandwidth of one v5e ICI link, bytes/s
V5E_ICI_LINK_BW = 45e9
#: links per torus axis direction usable by a ring (bidirectional ring = 2)
V5E_ICI_RING_LINKS = 2
#: per-host DCN bandwidth, bytes/s (data-center network between hosts)
V5E_DCN_HOST_BW = 25e9
#: per-collective launch overhead, seconds (dispatch + barrier)
COLLECTIVE_LATENCY = 5e-6


def ring_time(nbytes: int, n_dev: int, bw: float, kind: str) -> float:
    """Time for one ring collective of ``nbytes`` (full-tensor size) over
    ``n_dev`` devices at per-device ring bandwidth ``bw``."""
    if n_dev <= 1:
        return 0.0
    frac = (n_dev - 1) / n_dev
    mult = 2.0 if kind == "all-reduce" else 1.0
    return COLLECTIVE_LATENCY + mult * nbytes * frac / bw


def predict_scaling(
    compute_time_s: float,
    ops: Sequence[CollectiveOp],
    n_dev: int,
    *,
    link_bw: float = V5E_ICI_LINK_BW,
    ring_links: int = V5E_ICI_RING_LINKS,
    overlap_fraction: float = 0.0,
) -> Dict[str, float]:
    """Predicted step time + scaling efficiency for one sharded step.

    compute_time_s: measured single-chip compute time of the same work
    (per-device share). ops: audited collectives (full-tensor shapes, as
    GSPMD emits them). overlap_fraction: fraction of collective time hidden
    under compute by the latency-hiding scheduler (0 = fully exposed,
    conservative).
    """
    bw = link_bw * ring_links
    t_comm = sum(
        ring_time(op.bytes, op.group_size or n_dev, bw, op.kind)
        for op in ops)
    exposed = t_comm * (1.0 - overlap_fraction)
    t_step = compute_time_s + exposed
    return {
        "n_dev": n_dev,
        "t_compute_s": compute_time_s,
        "t_comm_s": t_comm,
        "t_comm_exposed_s": exposed,
        "t_step_s": t_step,
        "efficiency": compute_time_s / t_step if t_step else 1.0,
    }
