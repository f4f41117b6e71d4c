"""Pruning-dependency graph layer: declarative node groups, cost model,
and the OTO facade (SURVEY.md §2.3 graph/ + §7 item 4)."""

from .autogroups import discover_node_groups, trace_cost_report
from .builders import (
    mark_unprunable,
    autoencoder_node_groups,
    mobilenet_node_groups,
    resnet_node_groups,
    transformer_node_groups,
    ultranet_node_groups,
    vit_node_groups,
)
from .costs import (resnet_cost_report, transformer_cost_report,
                    ultranet_cost_report, vit_cost_report)
from .costs import autoencoder_cost_report
from .oto import OTO
from .tracer import TracedGraph, TraceNode, validate_node_groups

__all__ = [
    "OTO",
    "discover_node_groups",
    "trace_cost_report",
    "vit_node_groups",
    "resnet_node_groups",
    "autoencoder_node_groups",
    "mobilenet_node_groups",
    "transformer_node_groups",
    "ultranet_node_groups",
    "mark_unprunable",
    "vit_cost_report",
    "resnet_cost_report",
    "transformer_cost_report",
    "ultranet_cost_report",
    "autoencoder_cost_report",
    "TracedGraph",
    "TraceNode",
    "validate_node_groups",
]
