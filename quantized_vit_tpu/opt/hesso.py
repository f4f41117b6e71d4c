"""HESSO: pruning-only hybrid structured sparse optimizer.

Reference: only_train_once/optimizer/hesso.py:9-199. Same importance/
redundant machinery as GETA but no quantization phases: redundant groups are
decayed multiplicatively by (T-t-1)/(T-t) each step of a pruning period
(hesso.py:155-170), then hard-zeroed at commit.

Shares the group/importance/mask machinery with :class:`~.geta.GETA`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geta import GETA, GETAConfig, _is_quant_leaf, _tree_map_with_path
from .groups import NodeGroup, Transform, get_path, group_mask_for_param, set_path


@dataclasses.dataclass
class HESSOConfig:
    lr: float = 1e-3
    variant: str = "sgd"
    first_momentum: float = 0.0
    second_momentum: float = 0.0
    dampening: float = 0.0
    weight_decay: float = 0.0
    target_group_sparsity: float = 0.5
    start_pruning_step: int = 0
    pruning_steps: int = 1
    pruning_periods: int = 1
    group_divisible: int = 1
    importance_criteria: Optional[Dict[str, float]] = None

    def to_geta(self) -> GETAConfig:
        return GETAConfig(
            lr=self.lr, lr_quant=self.lr, variant=self.variant,
            first_momentum=self.first_momentum,
            second_momentum=self.second_momentum,
            dampening=self.dampening, weight_decay=self.weight_decay,
            target_group_sparsity=self.target_group_sparsity,
            # No projection phase: everything before pruning is warmup.
            start_projection_step=10**12,
            start_pruning_step=self.start_pruning_step,
            pruning_steps=self.pruning_steps,
            pruning_periods=self.pruning_periods,
            group_divisible=self.group_divisible,
            grad_clip_min=-float("inf"), grad_clip_max=float("inf"),
            importance_criteria=self.importance_criteria,
        )


class HESSO(GETA):
    """Pruning-only optimizer reusing GETA's scheduling/masks, with the
    simpler multiplicative decay update (hesso.py:128-180)."""

    def __init__(self, groups: Sequence[NodeGroup], params,
                 cfg: HESSOConfig):
        self._hesso_cfg = cfg
        super().__init__(groups, params, cfg.to_geta())

    def step(self, params, grads):
        from .geta import _compute_grad_variant

        cfg = self.cfg
        self.num_steps += 1
        n = self.num_steps

        gv, self.m1, self.m2 = _compute_grad_variant(
            params, grads, self.m1, self.m2, jnp.float32(n), cfg.variant,
            cfg.first_momentum, cfg.second_momentum, cfg.dampening,
            cfg.weight_decay)

        if (n >= cfg.start_pruning_step
                and self.curr_pruning_period < cfg.pruning_periods
                and self.pruning_period_duration != 0):
            if (n - cfg.start_pruning_step - 1) % self.pruning_period_duration == 0:
                self._commit_redundant()
                scores = self._compute_importance(params, gv)
                self._identify_redundant(scores)
                self.curr_pruning_period += 1

        t_frac = 0
        if self.pruning_period_duration != 0:
            t_frac = (n - cfg.start_pruning_step) % self.pruning_period_duration

        prune_ids = tuple(sorted(
            g.id for g in self._prunable()
            if self.state[g.id]["active_redundant"]))

        key = ("hesso", prune_ids)
        if key not in self._apply_cache:
            self._apply_cache[key] = self._build_hesso_apply(prune_ids)
        apply_fn = self._apply_cache[key]
        decay = 1.0
        if self.pruning_period_duration != 0:
            decay = ((self.pruning_period_duration - t_frac - 1.0)
                     / (self.pruning_period_duration - t_frac))
        params = apply_fn(params, gv,
                          self._masks("active_redundant"),
                          self._masks("pruned"),
                          jnp.float32(cfg.lr), jnp.float32(decay))

        if (self.pruning_period_duration != 0
                and n >= cfg.start_pruning_step
                and t_frac == self.pruning_period_duration - 1):
            self._commit_redundant()
        return params

    def _build_hesso_apply(self, prune_ids: Tuple[str, ...]):
        cfg = self.cfg
        group_by_id = {g.id: g for g in self.groups}

        @jax.jit
        def apply_fn(params, gv, active, pruned, lr, decay):
            def upd(path, p, g):
                new = p - lr * g
                if cfg.weight_decay and cfg.variant == "adamw":
                    new = new - lr * cfg.weight_decay * p
                return new

            params = _tree_map_with_path(upd, params, gv)
            # Multiplicative decay of redundant rows (hesso.py:155-170)
            for gid in prune_ids:
                g = group_by_id[gid]
                mask = active[gid]
                for e in g.entries:
                    if e.transform == Transform.NO_PRUNE:
                        continue
                    p = get_path(params, e.path)
                    m = group_mask_for_param(mask, e.transform, p.shape,
                                             g.num_heads)
                    params = set_path(params, e.path,
                                      p * (1.0 - m) + p * m * decay)
            # Zero committed-pruned rows
            for g in self._prunable():
                mask = pruned[g.id]
                for e in g.entries:
                    if e.transform == Transform.NO_PRUNE:
                        continue
                    p = get_path(params, e.path)
                    m = group_mask_for_param(mask, e.transform, p.shape,
                                             g.num_heads)
                    params = set_path(params, e.path, p * (1.0 - m))
            return params

        return apply_fn
