"""Group importance scores — the five GETA saliency criteria.

Reference: only_train_once/optimizer/importance_score/{magnitude.py:6-34,
cosine_similarity.py:7-38, taylor.py:7-41} and the combination/normalization
pipeline in base_hybrid_sparse_optimizer.py:221-338. Pure functions over
(params, grad_variant) pytrees; each returns a [num_groups] vector per
prunable group, and :func:`combine_importance_scores` reproduces the global
L2 normalization + weighted sum + cost-aware gl_scale.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .groups import NodeGroup, Transform, get_path, group_matrix

_EPS = 1e-8
DEFAULT_CRITERIA: Dict[str, float] = {
    "magnitude": 0.2,
    "avg_magnitude": 0.2,
    "cosine_similarity": 0.2,
    "taylor_first_order": 0.2,
    "taylor_second_order": 0.2,
}


def _norms_and_inner(group: NodeGroup, params, grad_variant):
    """Shared reductions: (||p||², ||g||², <p,g>) per group row, plus total
    group columns. Entries with NO_PRUNE are skipped throughout.

    LoRA entries (path ending ``lora_b``): the frozen base weight carries no
    gradient, so the gradient proxy is the low-rank product A @ B against
    the BASE kernel (importance_score/taylor.py:43-107 lora variants);
    magnitude still comes from lora_b itself.
    """
    sq_p = jnp.zeros((group.num_groups,))
    sq_g = jnp.zeros((group.num_groups,))
    inner = jnp.zeros((group.num_groups,))
    cols = 0
    for e in group.entries:
        if e.transform == Transform.NO_PRUNE:
            continue
        p_arr = get_path(params, e.path)
        p = group_matrix(p_arr, e.transform, group.num_groups,
                         group.num_heads).astype(jnp.float32)
        cols += p.shape[1]
        sq_p = sq_p + jnp.sum(jnp.square(p), axis=1)
        if e.path.endswith("lora_b"):
            layer = e.path.rsplit("/", 1)[0]
            node = get_path(params, layer)
            base = node["kernel"] if "kernel" in node else node["embedding"]
            proxy = get_path(params, f"{layer}/lora_a") @ p_arr
            bm = group_matrix(base, e.transform, group.num_groups,
                              group.num_heads).astype(jnp.float32)
            gm = group_matrix(proxy, e.transform, group.num_groups,
                              group.num_heads).astype(jnp.float32)
            sq_g = sq_g + jnp.sum(jnp.square(gm), axis=1)
            inner = inner + jnp.sum(bm * gm, axis=1)
            continue
        g = group_matrix(get_path(grad_variant, e.path), e.transform,
                         group.num_groups, group.num_heads)
        g = g.astype(jnp.float32)
        sq_g = sq_g + jnp.sum(jnp.square(g), axis=1)
        inner = inner + jnp.sum(p * g, axis=1)
    return sq_p, sq_g, inner, cols


def raw_scores(group: NodeGroup, params, grad_variant,
               criteria: Sequence[str]) -> Dict[str, jax.Array]:
    """Per-criterion raw scores for one group (importance_score/*.py)."""
    sq_p, sq_g, inner, cols = _norms_and_inner(group, params, grad_variant)
    norm_p = jnp.sqrt(sq_p)
    out: Dict[str, jax.Array] = {}
    if "magnitude" in criteria:
        out["magnitude"] = norm_p
    if "avg_magnitude" in criteria:
        # magnitude.py:22-34: denominator is total column count + 1e-6
        out["avg_magnitude"] = norm_p / float(cols + 1e-6)
    if "cosine_similarity" in criteria:
        # cosine_similarity.py:36-38: cos + 1 (so >= 0)
        norm_g = jnp.sqrt(sq_g)
        out["cosine_similarity"] = (
            inner / (norm_p + _EPS) / (norm_g + _EPS) + 1.0
        )
    if "taylor_first_order" in criteria:
        out["taylor_first_order"] = jnp.abs(inner)
    if "taylor_second_order" in criteria:
        out["taylor_second_order"] = 0.5 * jnp.square(inner)
    return out


def combine_importance_scores(
    groups: Sequence[NodeGroup],
    params,
    grad_variant,
    criteria: Dict[str, float] = None,
    safe_guard: float = _EPS,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Global score pipeline (base_hybrid_sparse_optimizer.py:221-338).

    1. raw per-criterion scores for each prunable non-auxiliary group;
    2. per-criterion global L2 normalization: denom = sqrt(sum over all
       groups of score²) + safe_guard;
    3. overall = Σ weight_c / denom_c * score_c;
    4. gl_scale_i = clamp(cost^0.5 / |overall_i|, 0.1, 10), normalized by the
       global mean — the group-lasso weight fed to the training loss
       (utils.py:157-194).

    Returns (global_scores [total_groups] in group order, gl_scales list).
    """
    criteria = dict(DEFAULT_CRITERIA if criteria is None else criteria)
    active = [g for g in groups if g.is_prunable and not g.is_auxiliary]
    raw = [raw_scores(g, params, grad_variant, list(criteria)) for g in active]

    denoms = {
        name: jnp.sqrt(
            sum(jnp.sum(jnp.square(r[name])) for r in raw) + safe_guard
        ) + safe_guard
        for name in criteria
    }

    overalls = []
    for r in raw:
        overall = sum(
            (criteria[name] / denoms[name]) * r[name] for name in criteria
        )
        overalls.append(overall)

    # Cost-aware group-lasso scale (rho=0.5, clamped [0.1, 10])
    rho = 0.5
    from .groups import group_cols

    invs = []
    for g, overall in zip(active, overalls):
        cost = float(group_cols(g, params)) ** rho
        inv = cost / jnp.clip(jnp.abs(overall), _EPS, None)
        invs.append(jnp.clip(jnp.nan_to_num(inv, nan=1.0, posinf=10.0,
                                            neginf=0.1), 0.1, 10.0))
    all_inv = jnp.concatenate(invs) if invs else jnp.zeros((0,))
    mean = jnp.clip(jnp.mean(all_inv), _EPS, None) if invs else 1.0
    gl_scales = [inv / mean for inv in invs]

    global_scores = (
        jnp.concatenate(overalls) if overalls else jnp.zeros((0,))
    )
    return global_scores, gl_scales
