"""OTO facade: the one-stop user API over graph / optimizer / compression.

Reference: only_train_once/__init__.py:10-444 (`class OTO`): wraps graph
construction, optimizer factories (`.geta`, `.hesso`), subnet construction,
cost metrics and unprunable marking. The TPU-native facade takes a flax
module + params pytree instead of a torch module + dummy input — node groups
come from the declarative builders (graph/builders.py) instead of a
torch.jit trace.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ..models.ultranet import UltraNet
from ..models.vit import ViTConfig, VisionTransformer
from ..opt import GETA, GETAConfig, HESSO, HESSOConfig, NodeGroup
from .builders import mark_unprunable, ultranet_node_groups, vit_node_groups
from .costs import ultranet_cost_report, vit_cost_report


class OTO:
    """Facade over node groups + GETA/HESSO + compression + cost metrics.

    Usage (train.py:333-410 analogue)::

        oto = OTO(model, params)
        oto.mark_unprunable_by_param_names(["patch_embed", "pos_embed", "head"])
        opt = oto.geta(lr=1e-4, target_group_sparsity=0.5, ...)
        ... training loop: params = opt.step(params, grads) ...
        new_model, new_params = oto.construct_subnet(params)
    """

    def __init__(self, model, params, batch_stats=None):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        if isinstance(model, VisionTransformer):
            self.kind = "vit"
            self.cfg: ViTConfig = model.cfg
            self.node_groups: List[NodeGroup] = vit_node_groups(
                self.cfg, params)
        elif isinstance(model, UltraNet):
            self.kind = "ultranet"
            self.cfg = None
            self.node_groups = ultranet_node_groups(params)
        else:
            raise ValueError(
                f"no node-group builder registered for {type(model).__name__};"
                " pass groups explicitly to GETA/HESSO")
        self._optimizer = None

    # ------------------------------------------------------------------
    # graph-side controls
    # ------------------------------------------------------------------

    def mark_unprunable_by_param_names(self, names: Sequence[str]):
        """__init__.py:403-413."""
        mark_unprunable(self.node_groups, list(names))

    # ------------------------------------------------------------------
    # optimizer factories (__init__.py:88-176)
    # ------------------------------------------------------------------

    def geta(self, **kwargs) -> GETA:
        cfg = GETAConfig(**kwargs)
        self._optimizer = GETA(self.node_groups, self.params, cfg)
        return self._optimizer

    def hesso(self, **kwargs) -> HESSO:
        cfg = HESSOConfig(**kwargs)
        self._optimizer = HESSO(self.node_groups, self.params, cfg)
        return self._optimizer

    # ------------------------------------------------------------------
    # compression (__init__.py:361-398)
    # ------------------------------------------------------------------

    def construct_subnet(self, params=None, batch_stats=None):
        """Slice the group-sparse net into a dense subnet. Returns
        (new_model, new_params) for ViT and
        (new_model, new_params, new_batch_stats) for UltraNet."""
        from ..compress import construct_subnet_ultranet, construct_subnet_vit

        params = self.params if params is None else params
        if self.kind == "vit":
            new_cfg, new_params = construct_subnet_vit(
                self.cfg, params, self.node_groups)
            return VisionTransformer(new_cfg), new_params
        channels, new_params, new_stats = construct_subnet_ultranet(
            params, self.node_groups,
            batch_stats if batch_stats is not None else self.batch_stats)
        model = UltraNet(w_bit=self.model.w_bit, a_bit=self.model.a_bit,
                         channels=channels)
        return model, new_params, new_stats

    # ------------------------------------------------------------------
    # cost metrics (__init__.py:415-441)
    # ------------------------------------------------------------------

    def _report(self, params=None) -> Dict[str, Any]:
        params = self.params if params is None else params
        if self.kind == "vit":
            return vit_cost_report(self.cfg, params)
        return ultranet_cost_report(params)

    def compute_macs(self, params=None) -> float:
        return self._report(params)["total_macs"]

    def compute_bops(self, params=None) -> float:
        return self._report(params)["total_bops"]

    def compute_num_params(self, params=None) -> int:
        return self._report(params)["num_params"]

    def compute_weight_size(self, params=None) -> float:
        """Total weight bits under learned bit widths."""
        return self._report(params)["weight_size_bits"]

    def compute_average_bit_width(self, params=None) -> float:
        return self._report(params)["average_bit_width"]

    # ------------------------------------------------------------------
    # visualization (__init__.py:62-86)
    # ------------------------------------------------------------------

    def visualize(self, out_path: Optional[str] = None) -> str:
        """Emit the node-group structure as Graphviz DOT text."""
        lines = ["digraph node_groups {", "  rankdir=TB;",
                 '  node [shape=box, fontname="helvetica"];']
        for g in self.node_groups:
            color = "lightblue" if g.is_prunable else "lightgray"
            label = (f"{g.id}\\n{g.num_groups} groups"
                     f"{' (unprunable)' if not g.is_prunable else ''}")
            lines.append(
                f'  "{g.id}" [label="{label}", style=filled,'
                f' fillcolor={color}];')
        ordered = [g.id for g in self.node_groups]
        for a, b in zip(ordered, ordered[1:]):
            lines.append(f'  "{a}" -> "{b}" [style=invis];')
        lines.append("}")
        dot = "\n".join(lines)
        if out_path:
            with open(out_path, "w") as f:
                f.write(dot)
        return dot
