"""Generic subnet construction for AUTO-discovered groups.

The reference's `automated_pruning_compression`
(only_train_once/subnet_construction/pruning_compression.py:4-391) slices
any traced model: pass 1 prunes each node group's out-dim (:51-58), pass 2
finds the incoming stem group by DFS and prunes in-dims (:134-215),
expanding flatten->linear indices (:335-346). Here the same links come from
the jaxpr dataflow walk that discovered the groups
(graph/autogroups.py::discover_node_groups(return_plan=True)), so any model
the auto-partitioner can trace can also be physically compressed:

- pass 1 (out-dims): per group, kernels' last axis + (out,)-shaped
  accessories (bias, BN/LN scale...) keep the non-zero group rows;
- pass 2 (in-dims): per stem, the producer group's kept indices — expanded
  by the recorded flatten multiplicity (channels fastest-varying) — slice
  the kernel's in axis (first for dense, axis 2 for conv HWIO); depthwise
  kernels have no in axis to slice (their channel dim IS the group);
- batch_stats leaves ((C,)-shaped, e.g. BN running mean/var) under a
  group's accessory layers are sliced with the same indices.

Since the sliced-away rows/columns are exactly zero (GETA/HESSO drive them
to zero before construction), the compressed forward equals the sparse full
forward; tests/compress/test_auto_subnet.py property-tests this on a model
outside the family zoo.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..graph.autogroups import StemPlan
from ..opt.groups import (
    NodeGroup,
    Transform,
    get_path,
    has_path,
    set_path,
)
from .subnet import _kept_nonempty, _take


def _layer_of(path: str) -> str:
    return path.rsplit("/", 1)[0] if "/" in path else path


def construct_subnet_auto(
    params,
    groups: Sequence[NodeGroup],
    plan: Dict[str, StemPlan],
    batch_stats=None,
) -> Tuple[Any, Dict[str, Tuple[int, ...]], Optional[Any]]:
    """Physically slice a group-sparse model with auto-discovered groups.

    Returns ``(new_params, shapes, new_batch_stats)`` where ``shapes`` maps
    each stem layer to its new kernel shape — callers rebuild their module
    with matching widths (flax modules carry static feature counts, so
    unlike the reference's in-place torch surgery the architecture object
    must be re-made; the params pytree itself is the compressed network).
    """
    by_id = {g.id: g for g in groups}
    kept: Dict[str, np.ndarray] = {}
    for g in groups:
        if g.is_prunable and not g.is_auxiliary:
            kept[g.id] = _kept_nonempty(g, params)

    new = params
    new_stats = batch_stats

    # ---- pass 1: out-dims + accessories, per group --------------------
    for g in groups:
        idx = kept.get(g.id)
        if idx is None or len(idx) == g.num_groups:
            continue
        acc_layers = set()
        for e in g.entries:
            if e.transform == Transform.NO_PRUNE:
                continue
            p = get_path(new, e.path)
            if e.transform == Transform.ACCESSORY:
                new = set_path(new, e.path, _take(p, idx, 0))
                acc_layers.add(_layer_of(e.path))
            else:  # OUT kernels (incl. depthwise): group dim is last
                new = set_path(new, e.path, _take(p, idx, -1))
        # batch_stats (BN running mean/var) under accessory layers
        if new_stats is not None:
            for layer in sorted(acc_layers):
                flat, treedef = jax.tree_util.tree_flatten_with_path(new_stats)
                for kp, v in flat:
                    path = "/".join(str(getattr(k, "key", k)) for k in kp)
                    if (_layer_of(path) == layer
                            and np.shape(v) == (g.num_groups,)):
                        new_stats = set_path(new_stats, path, _take(v, idx, 0))

    # ---- pass 2: in-dims, per stem ------------------------------------
    for kpath, sp in plan.items():
        if sp.depthwise:
            continue  # channel dim already sliced as the group dim
        if sp.in_group_id is None:
            # no (or ambiguous) producer link: fine unless a pruned group
            # actually feeds this stem
            continue
        idx = kept.get(sp.in_group_id)
        g_in = by_id.get(sp.in_group_id)
        if idx is None or g_in is None or len(idx) == g_in.num_groups:
            continue
        if sp.in_spatial > 1:
            # flatten expansion: feature index = position * C + channel
            c = sp.in_channels
            idx = (np.arange(sp.in_spatial)[:, None] * c
                   + idx[None, :]).reshape(-1)
        k = get_path(new, kpath)
        ax = 0 if k.ndim == 2 else 2
        new = set_path(new, kpath, _take(k, idx, ax))

    shapes = {
        _layer_of(kpath): tuple(get_path(new, kpath).shape)
        for kpath in plan
        if has_path(new, kpath)
    }
    return new, shapes, new_stats
