"""Mesh construction, GSPMD partition rules (DP x TP), pipeline (PP)."""

from .partition import (
    create_mesh,
    VIT_PARTITION_RULES,
    spec_for_path,
    partition_specs,
    shard_params,
    data_sharding,
)
from .pipeline import (
    gpipe_blocks,
    stack_block_params,
    unstack_block_params,
    vit_pipeline_forward,
)

__all__ = [
    "create_mesh",
    "VIT_PARTITION_RULES",
    "spec_for_path",
    "partition_specs",
    "shard_params",
    "data_sharding",
    "gpipe_blocks",
    "stack_block_params",
    "unstack_block_params",
    "vit_pipeline_forward",
]
