"""Deviceless AOT compilation + scheduled-HLO audit for real TPU targets.

`parallel/audit.py` audits GSPMD's *logical* collectives on a virtual CPU
mesh. This module goes further: it compiles for an actual TPU topology
(e.g. ``v5e:2x2``) WITHOUT attached devices via
``jax.experimental.topologies.get_topology_desc`` and audits the
**scheduled TPU executable** — the same Mosaic kernels, collective
emitters (ring reduce-scatter fusions, 1D all-gather emitters) and
instruction schedule that would run on a real slice. That turns two
previously assumed quantities into measurements:

- the collective set: what the TPU backend actually emits (e.g.
  ``psum_scatter`` lowers to a ``kCustom SingleInputAllReduceScatterFusion
  / StrategyRing``, not an all-reduce + slice), with true on-wire dtypes
  (bf16 stays bf16 on TPU where the CPU lowering promotes to f32);
- the overlap: which collectives the latency-hiding scheduler actually
  ran async (``-start``/``-done`` pairs) and how many compiler-estimated
  compute cycles sit between start and done — measured overlap, not an
  ``overlap_fraction`` assumption.

Used by tools/scaling_report.py to generate docs/SCALING.md and by the
multichip dryrun for an honest real-shape efficiency prediction.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from .audit import (COLLECTIVE_LATENCY, V5E_ICI_LINK_BW, V5E_ICI_RING_LINKS,
                    ring_time)

#: v5e core clock, cycles/s (public: 940 MHz) — converts the scheduler's
#: per-op "estimated_cycles" backend annotations into seconds.
V5E_CLOCK_HZ = 940e6

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 0.5, "u4": 0.5, "s16": 2, "u16": 2,
    "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8,
}

_SHAPE_RE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
_EMITTER_RE = re.compile(r'"emitter":"(\w+)"')

_COLLECTIVE_KINDS = ("all-reduce", "all-gather", "reduce-scatter",
                     "all-to-all", "collective-permute")


def get_topology(name: str = "v5e:2x2"):
    """Deviceless TPU topology description (compile target)."""
    from jax.experimental import topologies

    return topologies.get_topology_desc(platform="tpu", topology_name=name)


@dataclasses.dataclass
class SchedOp:
    """One instruction of the scheduled ENTRY computation."""

    index: int
    name: str
    kind: str                    # collective kind, 'custom-call', 'fusion', …
    dtype: str = ""
    result_bytes: int = 0
    full_bytes: int = 0          # full-tensor size S for the ring model
    group_size: int = 1
    is_async_start: bool = False
    is_async_done: bool = False
    start_name: str = ""         # for -done ops: the matching start
    estimated_cycles: int = 0
    emitter: str = ""


def _result_bytes(line: str) -> tuple[str, int]:
    m = _SHAPE_RE.search(line.split(" = ", 1)[1] if " = " in line else line)
    if not m:
        return "", 0
    dtype, dims = m.group(1), m.group(2)
    shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
    nbytes = int(np.prod(shape, dtype=np.int64) * _DTYPE_BYTES.get(dtype, 4))
    return dtype, nbytes


def _group_size(line: str) -> int:
    m = _GROUPS_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # iota form [num_groups, group_size]<=[total]
        return int(m.group(2))
    # kCustom collective fusions carry no replica_groups on the ENTRY line;
    # the ring emitter's debug config names the group size as "shard count"
    m = re.search(r"shard count:(\d+)", line)
    if m:
        return int(m.group(1))
    return 1


def parse_entry_schedule(hlo_text: str) -> List[SchedOp]:
    """Parse the scheduled ENTRY computation into SchedOp records.

    Only ENTRY instructions execute; called computations (fusion bodies)
    describe semantics — in particular the ``kCustom`` collective fusions'
    inner all-reduce+slice spec is NOT what runs (the backend_config's
    ``collective_algorithm_config.emitter`` names the real ring emitter),
    so collectives are classified from the ENTRY line + backend_config."""
    idx = hlo_text.index("\nENTRY ")
    entry = hlo_text[idx:]
    ops: List[SchedOp] = []
    i = 0
    for raw in entry.splitlines():
        s = raw.strip()
        if not (s.startswith("%") or s.startswith("ROOT %")):
            continue
        if " = " not in s:
            continue
        name = s.split(" = ")[0].replace("ROOT ", "").strip()
        body = s.split(" = ", 1)[1]
        # opcode = token right before the first '(' after the shape
        hlo_op = ""
        m3 = re.search(r"([a-z][a-z0-9_.-]*)\(", body)
        if m3:
            hlo_op = m3.group(1)
        dtype, rbytes = _result_bytes(s)
        op = SchedOp(index=i, name=name, kind=hlo_op, dtype=dtype,
                     result_bytes=rbytes)
        cm = _CYCLES_RE.search(s)
        if cm:
            op.estimated_cycles = int(cm.group(1))
        em = _EMITTER_RE.search(s)
        if em:
            op.emitter = em.group(1)
        op.group_size = _group_size(s)

        # classify collectives
        kind = None
        for k in _COLLECTIVE_KINDS:
            if re.search(rf"\b{k}(-start|-done)?\(", body):
                kind = k
                break
        if kind is None and op.emitter:
            e = op.emitter.lower()
            if "reducescatter" in e:
                kind = "reduce-scatter"
            elif "allgather" in e:
                kind = "all-gather"
            elif "allreduce" in e:
                kind = "all-reduce"
            elif "alltoall" in e:
                kind = "all-to-all"
        if kind:
            op.kind = kind
            op.is_async_start = "-start(" in body
            op.is_async_done = "-done(" in body
            if op.is_async_done:
                sm = re.search(r"-done\(%([\w.-]+)\)", body)
                op.start_name = "%" + sm.group(1) if sm else ""
            # full-tensor size S for the ring model:
            #  all-gather: result IS the full tensor;
            #  reduce-scatter (custom fusion): result is one shard -> x p;
            #  all-reduce: result is the full tensor;
            #  collective-permute / all-to-all: bytes moved = result.
            if kind == "reduce-scatter":
                op.full_bytes = op.result_bytes * op.group_size
            elif kind == "collective-permute" and op.is_async_start:
                # tuple result (in, out, sflags...) -> single buffer size
                op.full_bytes = op.result_bytes // 2
            else:
                op.full_bytes = op.result_bytes
        ops.append(op)
        i += 1
    return ops


def audit_schedule(hlo_text: str) -> Dict:
    """Audit a scheduled TPU HLO: collectives (with full-tensor bytes and
    group sizes) + measured async overlap.

    Overlap is MEASURED from the schedule: for each async collective pair,
    the compiler-estimated cycles of every op issued between ``-start`` and
    ``-done`` (the work the scheduler actually placed under the
    collective). Synchronous collectives get overlap 0 by construction."""
    ops = parse_entry_schedule(hlo_text)
    colls = [o for o in ops if o.kind in _COLLECTIVE_KINDS]
    by_name = {o.name: o for o in ops}
    seq = ops

    overlap_s_total = 0.0
    pairs = []
    for done in colls:
        if not done.is_async_done or not done.start_name:
            continue
        start = by_name.get(done.start_name)
        if start is None:
            continue
        between = seq[start.index + 1:done.index]
        cyc = sum(o.estimated_cycles for o in between)
        n_opaque = sum(1 for o in between
                       if o.kind in ("custom-call",) and not o.estimated_cycles)
        t = cyc / V5E_CLOCK_HZ
        overlap_s_total += t
        pairs.append({"start": start.name, "done": done.name,
                      "between_ops": len(between),
                      "between_est_cycles": cyc,
                      "between_opaque_customcalls": n_opaque,
                      "overlap_s": t})

    # collapse: count -start/-done as ONE op (keep the start)
    counted = [o for o in colls if not o.is_async_done]
    summary: Dict[str, Dict[str, float]] = {}
    for o in counted:
        s = summary.setdefault(o.kind, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += o.full_bytes
    return {
        "ops": counted,
        "summary": summary,
        "async_pairs": pairs,
        "n_async": len(pairs),
        "n_sync": len([o for o in counted if not o.is_async_start]),
        "overlap_s_measured": overlap_s_total,
    }


def predict_tp_step(compute_s: float, audit: Dict, *,
                    link_bw: float = V5E_ICI_LINK_BW,
                    ring_links: int = V5E_ICI_RING_LINKS) -> Dict[str, float]:
    """Step-time / efficiency prediction from an audited schedule.

    compute_s: per-device compute share (measured single-chip time / tp).
    Collective time: analytic ring model per op at its audited full-tensor
    size and group size. Exposed time: ring time minus the MEASURED overlap
    (never below 0 per pair), summed; synchronous ops are fully exposed."""
    bw = link_bw * ring_links
    ops: Sequence[SchedOp] = audit["ops"]
    pair_overlap = {p["start"]: p["overlap_s"] for p in audit["async_pairs"]}
    t_comm = 0.0
    t_exposed = 0.0
    for o in ops:
        t = ring_time(o.full_bytes, o.group_size, bw, o.kind)
        t_comm += t
        t_exposed += max(0.0, t - pair_overlap.get(o.name, 0.0))
    t_step = compute_s + t_exposed
    return {
        "t_compute_s": compute_s,
        "t_comm_s": t_comm,
        "t_comm_exposed_s": t_exposed,
        "overlap_s_measured": audit["overlap_s_measured"],
        "t_step_s": t_step,
        "efficiency": compute_s / t_step if t_step else 1.0,
    }


def aot_compile(fn_jitted, abstract_args, compiler_options: Optional[dict]
                = None) -> str:
    """Lower + compile for the (deviceless) target and return scheduled HLO
    text. ``abstract_args``: pytree of ShapeDtypeStruct with NamedShardings
    over a Mesh built from the topology's devices."""
    lowered = fn_jitted.lower(*abstract_args)
    compiled = (lowered.compile(compiler_options=compiler_options)
                if compiler_options else lowered.compile())
    return compiled.as_text()
