"""Mesh construction and GSPMD partition rules (DP x TP)."""

from .partition import (
    create_mesh,
    VIT_PARTITION_RULES,
    spec_for_path,
    partition_specs,
    shard_params,
    data_sharding,
)

__all__ = [
    "create_mesh",
    "VIT_PARTITION_RULES",
    "spec_for_path",
    "partition_specs",
    "shard_params",
    "data_sharding",
]
