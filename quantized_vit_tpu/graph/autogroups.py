"""Automatic pruning-dependency discovery from a jaxpr trace.

The reference partitions arbitrary models into pruning-zero-invariant
groups ("pzigs") by walking its traced ONNX graph
(dependency_graph/pruning_dependency.py:347-538): connected components of
non-stem nodes grow upstream until stem nodes (step 1-3), intersecting
groups merge (step 4, residual additions), depthwise convs merge into
their incoming group (step 7), and groups adjacent to the model output are
unprunable (step 10). Composed ops (attention) are NOT discovered — they
come from a per-module-class registry (COMPOSED_MODULES,
operation/operator.py:1422-1438).

This module is the jaxpr equivalent for the same scope: **basic
architectures** — convnets with BN/residuals/depthwise, MLPs — are
partitioned automatically by dataflow analysis on the
:class:`~quantized_vit_tpu.graph.tracer.TracedGraph`; attention/composed
families keep their declarative builders (builders.py), mirroring the
reference's registry split.

Algorithm (flax layouts: channels last, kernels [..., in, out]):

1. every dot_general/conv consuming a labeled kernel param is a **stem**;
   its out-axis is a candidate pruning group.
2. walk the dataflow FORWARD from each stem, tracking which axis of each
   intermediate value carries the stem's output channels (elementwise ops
   keep it, transpose permutes it, reductions shift it, reshape keeps it
   while the trailing dim is preserved).
3. when two tracked flows meet at an elementwise op (residual add), their
   stems merge into one group (union-find — reference step 4).
4. a (C,)-shaped param encountered on the untracked side of an elementwise
   op (BN/LN scale and bias, after provenance through their rsqrt math)
   joins the group as ACCESSORY.
5. a tracked value feeding another stem's DATA input stops there (that
   stem's in-dim follows at compression); feeding a DEPTHWISE conv merges
   the depthwise kernel into the group and continues through it
   (reference step 7).
6. a tracked value reaching the traced output, or an op the tracker can't
   see through, marks the group unprunable (reference step 10's
   adjacent-to-output / no-stem rules, conservatively extended).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import jax
import numpy as np

from ..opt.groups import NodeGroup, ParamEntry, Transform
from .tracer import TracedGraph, TraceNode

# ops through which the channel axis passes unchanged (elementwise / shape-
# preserving); binary members may also merge flows or pick up accessories
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "pow", "and", "or", "xor",
    "tanh", "logistic", "exp", "log", "rsqrt", "sqrt", "erf", "abs", "sign",
    "neg", "floor", "ceil", "round", "clamp", "select_n", "custom_jvp_call",
    "custom_vjp_call", "custom_vjp_call_jaxpr", "convert_element_type",
    "integer_pow", "stop_gradient", "nextafter", "copy",
}
_PASS_THROUGH = {"reduce_window_max", "reduce_window_sum", "pad", "slice",
                 "dynamic_slice", "rev"}
_STEM_OPS = {"dot_general", "conv_general_dilated"}


@dataclasses.dataclass
class _Stem:
    node: TraceNode
    kernel_path: str
    bias_path: Optional[str]
    out_channels: int
    depthwise: bool


class _UnionFind:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, a: int) -> int:
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _param_shapes(params) -> Dict[str, Tuple[int, ...]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return {
        "/".join(str(getattr(k, "key", k)) for k in kp): tuple(np.shape(v))
        for kp, v in flat
    }


def _layer_of(path: str) -> str:
    return path.rsplit("/", 1)[0] if "/" in path else path


def _is_quant_scalar(path: str) -> bool:
    """Quant scalars never prune and never count as accessories."""
    name = path.rsplit("/", 1)[-1]
    return name.startswith(("d_quant", "q_m", "t_quant"))


def _build_provenance(graph: TracedGraph) -> Dict[str, Set[str]]:
    """Transitive labeled-param set per node (nodes are topological)."""
    provenance: Dict[str, Set[str]] = {}
    for n in graph.nodes:
        deps: Set[str] = set(n.param_names)
        for src in n.inputs:
            if src in provenance:
                deps |= provenance[src]
        provenance[n.id] = deps
    return provenance


def _operand_kernel(arg_id, shapes, provenance) -> Optional[str]:
    """The >=2-dim labeled param an operand (transitively) derives from —
    finds the kernel through fake-quant math (the traced-quantizer
    situation the reference collapses in graph.py:525-662), or None when
    the operand isn't a single kernel's product."""
    if arg_id is None or arg_id == "<arg>":
        return None
    deps = {arg_id} if arg_id in shapes else provenance.get(arg_id, set())
    kernels = [p for p in deps if len(shapes.get(p, ())) >= 2
               and not _is_quant_scalar(p)]
    return kernels[0] if len(kernels) == 1 else None


@dataclasses.dataclass
class StemPlan:
    """Per-stem compression recipe (generic subnet construction).

    Mirrors what the reference's `automated_pruning_compression` derives by
    DFS at compression time (pruning_compression.py:134-215, 335-346):
    which group owns the stem's out-dim, which group's kept indices its
    in-dim follows, and the flatten multiplicity (spatial positions folded
    into the feature axis between the producer and this stem).
    """

    kernel_path: str
    bias_path: Optional[str]
    group_id: str                     # group owning the out-dim
    op: str                           # 'dot_general' | 'conv_general_dilated'
    depthwise: bool
    in_group_id: Optional[str] = None  # group whose kept idxes the in-dim follows
    in_spatial: int = 1               # flatten expansion factor
    in_channels: int = 0              # producer group's channel count


def discover_node_groups(model, params, example_input,
                         batch_stats=None,
                         model_kwargs: Optional[dict] = None,
                         return_edges: bool = False,
                         return_plan: bool = False):
    """Partition a basic model into pruning groups by jaxpr dataflow.

    Traces ``model.apply`` on ``example_input`` and runs the pzig steps
    above. Returns NodeGroups compatible with GETA/HESSO/compression.
    Raises ValueError when the trace contains structure this basic
    partitioner can't follow soundly next to a kernel (e.g. attention
    reshapes) — use the declarative family builders for those models.

    ``return_plan``: additionally return ``{kernel_path: StemPlan}`` — the
    in-dim links needed for generic physical compression
    (compress/auto.py), derived from the same dataflow walk.
    """
    model_kwargs = dict(model_kwargs or {})
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def fn(params_arg, x):
        v = dict(variables)
        v["params"] = params_arg
        return model.apply(v, x, **model_kwargs)

    graph = TracedGraph.trace(fn, params, example_input, params=params)
    shapes = _param_shapes(params)

    # forward adjacency
    consumers: Dict[str, List[TraceNode]] = {}
    for n in graph.nodes:
        for src in n.inputs:
            consumers.setdefault(src, []).append(n)
    output_ids = set(graph.output_ids)

    provenance = _build_provenance(graph)
    is_quant_scalar = _is_quant_scalar

    # ------------------------------------------------------------------
    # step 1: stems — kernels found by provenance (see _operand_kernel)
    # ------------------------------------------------------------------
    stems: List[_Stem] = []
    stem_by_node: Dict[str, int] = {}
    grouped_conv_stems: Set[int] = set()
    for n in graph.nodes:
        if n.op not in _STEM_OPS or len(n.arg_ids) < 2:
            continue
        if n.op == "conv_general_dilated":
            kpath = _operand_kernel(n.arg_ids[1], shapes, provenance)
        else:
            kpath = (_operand_kernel(n.arg_ids[1], shapes, provenance)
                     or _operand_kernel(n.arg_ids[0], shapes, provenance))
        if kpath is None:
            continue
        kshape = shapes[kpath]
        out_ch = kshape[-1]
        # depthwise iff the CONV says so (feature_group_count > 1 with a
        # single in-channel slice per filter); a regular conv on 1-channel
        # input also has kshape[2] == 1 but fgc == 1 and must form its own
        # group like any other stem
        fgc = int(n.attrs.get("feature_group_count", 1)) if n.attrs else 1
        depthwise = (n.op == "conv_general_dilated" and fgc > 1
                     and len(kshape) == 4 and kshape[2] == 1)
        if n.op == "conv_general_dilated" and fgc > 1 and not depthwise:
            # general grouped conv: channel<->group coupling this basic
            # partitioner doesn't model — keep the stem but never prune it
            grouped_conv_stems.add(len(stems))
        bias = None
        cand = f"{_layer_of(kpath)}/bias"
        if cand in shapes and shapes[cand] == (out_ch,):
            bias = cand
        stem_by_node[n.id] = len(stems)
        stems.append(_Stem(n, kpath, bias, out_ch, depthwise))

    if not stems:
        raise ValueError("no kernel-consuming stems found in trace")

    uf = _UnionFind(len(stems))
    accessories: Dict[int, List[str]] = {i: [] for i in range(len(stems))}
    # unprunable holds STEM indices (not union-find roots: a later merge
    # re-roots the group and a root recorded at marking time would silently
    # drop the flag); assembly checks members against it
    unprunable: Set[int] = set(grouped_conv_stems)

    # ------------------------------------------------------------------
    # steps 2-7: forward walk from each stem
    # ------------------------------------------------------------------
    def walk(stem_idx: int):
        stem = stems[stem_idx]
        start = stem.node
        # (node_id, channel_axis, spatial) frontier; axis indexes the node's
        # OUTPUT; spatial counts positions folded into the axis by flattens
        # (pruning_compression.py:335-346 flatten->linear index expansion)
        out_ndim = len(start.shape or ())
        frontier: List[Tuple[str, int, int]] = [(start.id, out_ndim - 1, 1)]
        seen: Set[Tuple[str, int]] = {(start.id, out_ndim - 1)}
        claimed: Dict[Tuple[str, int], int] = walk.claimed

        while frontier:
            nid, axis, spatial = frontier.pop()
            if nid in output_ids:
                unprunable.add(stem_idx)
            for nxt in consumers.get(nid, ()):  # consumers of this value
                if nxt.op in _STEM_OPS and nxt.id in stem_by_node:
                    j = stem_by_node[nxt.id]
                    stem_edges.add((stem_idx, j))
                    # dense/conv data input: in-dim follows at compression
                    in_links.setdefault(j, set()).add((stem_idx, spatial))
                    if stems[j].depthwise:
                        # step 7: depthwise conv joins the incoming group
                        uf.union(stem_idx, j)
                        nd = len(nxt.shape or ())
                        key = (nxt.id, nd - 1)
                        if key not in seen:
                            seen.add(key)
                            frontier.append((nxt.id, nd - 1, spatial))
                    continue
                stepped = _axis_through(nxt, nid, axis, graph)
                if stepped is None:
                    # opaque op next to the group -> conservative unprunable
                    unprunable.add(stem_idx)
                    continue
                new_axis, mult = stepped
                new_spatial = spatial * mult
                if nxt.op in _ELEMENTWISE and len(nxt.inputs) > 1:
                    for other in nxt.inputs:
                        if other == nid:
                            continue
                        key = (other, axis)
                        if key in claimed and \
                                uf.find(claimed[key]) != uf.find(stem_idx):
                            # step 4: residual junction -> merge groups
                            uf.union(claimed[key], stem_idx)
                        else:
                            # accessory params reaching this op (BN/LN
                            # scale/bias and friends). The other operand
                            # must be a PURE per-channel chain: if any
                            # kernel param is in its provenance it's a data
                            # branch (residual without claim yet, or STE
                            # plumbing `x + stop_gradient(..)` whose history
                            # contains the whole upstream), never an
                            # accessory.
                            deps = (provenance.get(other, set())
                                    if other in graph.by_id
                                    else ({other} if other in shapes
                                          else set()))
                            if any(len(shapes.get(q, ())) >= 2
                                   for q in deps):
                                continue
                            for p in deps:
                                if (shapes.get(p) == (stem.out_channels,)
                                        and not is_quant_scalar(p)
                                        and p not in accessories[stem_idx]):
                                    accessories[stem_idx].append(p)
                key = (nxt.id, new_axis)
                claimed[key] = stem_idx
                if key not in seen:
                    seen.add(key)
                    frontier.append((nxt.id, new_axis, new_spatial))

    stem_edges: Set[Tuple[int, int]] = set()
    in_links: Dict[int, Set[Tuple[int, int]]] = {}
    walk.claimed = {}
    for i in range(len(stems)):
        if not stems[i].depthwise:
            walk.claimed[(stems[i].node.id,
                          len(stems[i].node.shape or ()) - 1)] = i
    for i in range(len(stems)):
        if not stems[i].depthwise:
            walk(i)

    # ------------------------------------------------------------------
    # assemble groups per union-find root
    # ------------------------------------------------------------------
    roots: Dict[int, List[int]] = {}
    for i in range(len(stems)):
        roots.setdefault(uf.find(i), []).append(i)

    groups: List[NodeGroup] = []
    for root, members in sorted(roots.items()):
        out_ch = stems[members[0]].out_channels
        entries: List[ParamEntry] = []
        added: Set[str] = set()
        ok = True
        for i in members:
            s = stems[i]
            if s.out_channels != out_ch:
                ok = False  # inconsistent merge (shouldn't happen)
            for path, tf in ((s.kernel_path, Transform.OUT),
                             (s.bias_path, Transform.ACCESSORY)):
                if path and path not in added:
                    added.add(path)
                    entries.append(ParamEntry(path, tf))
            layer = _layer_of(s.kernel_path)
            for q in ("d_quant_wt", "q_m_wt", "t_quant_wt",
                      "d_quant_act", "q_m_act", "t_quant_act"):
                qp = f"{layer}/{q}"
                if qp in shapes and qp not in added:
                    added.add(qp)
                    entries.append(ParamEntry(qp, Transform.NO_PRUNE))
            for p in accessories.get(i, ()):
                if p not in added:
                    added.add(p)
                    entries.append(ParamEntry(p, Transform.ACCESSORY))
        gid = _layer_of(stems[members[0]].kernel_path)
        groups.append(NodeGroup(
            id=gid, entries=entries, num_groups=out_ch,
            is_prunable=ok and not any(i in unprunable for i in members),
        ))
    gid_of = {root: _layer_of(stems[members[0]].kernel_path)
              for root, members in roots.items()}
    ret: List[Any] = [groups]
    if return_edges:
        edges = sorted({
            (gid_of[uf.find(a)], gid_of[uf.find(b)])
            for a, b in stem_edges
            if uf.find(a) != uf.find(b)
        })
        ret.append(edges)
    if return_plan:
        plan: Dict[str, StemPlan] = {}
        for j, s in enumerate(stems):
            sp = StemPlan(
                kernel_path=s.kernel_path, bias_path=s.bias_path,
                group_id=gid_of[uf.find(j)], op=s.node.op,
                depthwise=s.depthwise)
            feeds = in_links.get(j, set())
            feed_roots = {uf.find(i) for i, _ in feeds}
            spatials = {sp_ for _, sp_ in feeds}
            if len(feed_roots) == 1 and len(spatials) == 1:
                r = feed_roots.pop()
                sp.in_group_id = gid_of[r]
                sp.in_spatial = spatials.pop()
                sp.in_channels = stems[roots[r][0]].out_channels
            elif feeds:
                # ambiguous in-feed (concat of groups etc.): leave in-dim
                # unlinked; construct_subnet_auto refuses if that producer
                # group was actually pruned
                sp.in_group_id = None
            plan[s.kernel_path] = sp
        ret.append(plan)
    return ret[0] if len(ret) == 1 else tuple(ret)


def trace_cost_report(model, params, example_input,
                      batch_stats=None,
                      model_kwargs: Optional[dict] = None) -> Dict[str, Any]:
    """Generic analytic cost report from the jaxpr trace — the
    model-agnostic replacement for the reference's per-operator
    compute_macs/bops (operator.py:274-288, 510-515) and its fvcore probe
    (flops.py): per stem, MACs = prod(out_shape) * contraction size, BOPs =
    MACs * w_bit * a_bit from the layer's learned quant scalars (32 when
    absent). Shapes include the example batch; ``total_macs`` is
    per-example (divided by the leading batch dim).
    """
    model_kwargs = dict(model_kwargs or {})
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def fn(params_arg, x):
        v = dict(variables)
        v["params"] = params_arg
        return model.apply(v, x, **model_kwargs)

    graph = TracedGraph.trace(fn, params, example_input, params=params)
    shapes = _param_shapes(params)
    batch = int(np.shape(example_input)[0]) or 1
    provenance = _build_provenance(graph)

    from .costs import _layer_bits

    report: Dict[str, Any] = {"per_layer": {}, "total_macs": 0.0,
                              "total_bops": 0.0}
    for n in graph.nodes:
        if n.op not in _STEM_OPS or len(n.arg_ids) < 2:
            continue
        kpath = (_operand_kernel(n.arg_ids[1], shapes, provenance)
                 or (_operand_kernel(n.arg_ids[0], shapes, provenance)
                     if n.op == "dot_general" else None))
        if kpath is None or n.shape is None:
            continue
        kshape = shapes[kpath]
        contraction = int(np.prod(kshape[:-1]))
        macs = float(np.prod(n.shape)) * contraction / batch
        layer = _layer_of(kpath)
        w_bit, a_bit = _layer_bits(params, layer)
        entry = report["per_layer"].setdefault(
            layer, {"macs": 0.0, "bops": 0.0, "w_bit": w_bit,
                    "a_bit": a_bit})
        entry["macs"] += macs
        entry["bops"] += macs * w_bit * a_bit
        report["total_macs"] += macs
        report["total_bops"] += macs * w_bit * a_bit
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    report["num_params"] = int(sum(
        np.prod(np.shape(v)) for kp, v in flat
        if not _is_quant_scalar("/".join(str(getattr(k, "key", k))
                                         for k in kp))))
    return report


def _axis_through(node: TraceNode, src_id: str, axis: int,
                  graph: TracedGraph) -> Optional[Tuple[int, int]]:
    """Where does ``axis`` of input ``src_id`` land in ``node``'s output?

    Returns (new_axis, spatial_mult) — spatial_mult > 1 when the op folds
    leading positions into the channel axis (a flatten: [B, H, W, C] ->
    [B, H*W*C], channel fastest-varying), the case the reference expands
    at pruning_compression.py:335-346. None = the tracker can't follow.
    """
    src_shape = graph.by_id[src_id].shape if src_id in graph.by_id else None
    out_shape = node.shape
    if node.op in _ELEMENTWISE or node.op in _PASS_THROUGH:
        if (src_shape is not None and out_shape is not None
                and len(out_shape) == len(src_shape)):
            return axis, 1
        # broadcasting binary op: align trailing axes
        if src_shape is not None and out_shape is not None:
            shift = len(out_shape) - len(src_shape)
            return (axis + shift, 1) if axis + shift >= 0 else None
        return axis, 1
    if node.op == "broadcast_in_dim":
        return (len(out_shape) - 1, 1) if out_shape and axis == len(
            src_shape or ()) - 1 else None
    if node.op == "transpose":
        # output axis j takes input axis perm[j]; we don't have perm here,
        # so only the common channels-last-preserved case is followed
        if (src_shape and out_shape and axis == len(src_shape) - 1
                and out_shape[-1] == src_shape[-1]):
            return len(out_shape) - 1, 1
        return None
    if node.op in ("reduce_sum", "reduce_max", "reduce_min", "reduce_mean",
                   "reduce_prod", "reduce_and", "reduce_or"):
        if (src_shape and out_shape and axis == len(src_shape) - 1
                and out_shape and out_shape[-1] == src_shape[-1]):
            return len(out_shape) - 1, 1
        return None
    if node.op == "reshape":
        if (src_shape and out_shape and src_shape[-1] == out_shape[-1]
                and axis == len(src_shape) - 1):
            return len(out_shape) - 1, 1
        # flatten: trailing dims (incl. the tracked channel axis) collapse
        # into one feature axis, channels fastest-varying
        if (src_shape and out_shape and axis == len(src_shape) - 1
                and len(out_shape) < len(src_shape)
                and out_shape[-1] != src_shape[-1]
                and src_shape[-1] > 0
                and out_shape[-1] % src_shape[-1] == 0):
            folded = out_shape[-1] // src_shape[-1]
            lead = 1
            for k in range(len(src_shape) - 2,
                           len(out_shape) - 2, -1):
                lead *= src_shape[k]
            if lead == folded:
                return len(out_shape) - 1, folded
        return None
    if node.op == "squeeze":
        if (src_shape and out_shape and axis == len(src_shape) - 1
                and out_shape[-1] == src_shape[-1]):
            return len(out_shape) - 1, 1
        return None
    if node.op in ("concatenate", "gather", "scatter", "dynamic_update_slice",
                   "sort", "iota", "argmax", "argmin"):
        return None
    # default: same-rank ops keep the axis; rank changes are opaque
    if (src_shape is not None and out_shape is not None
            and len(out_shape) == len(src_shape)
            and out_shape[axis] == src_shape[axis]):
        return axis, 1
    return None
