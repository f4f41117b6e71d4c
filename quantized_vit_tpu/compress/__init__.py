"""Subnet materialization (SURVEY.md §7 item 6): slice group-sparse pytrees
into dense compressed networks with new static shapes."""

from .subnet import (
    construct_subnet_autoencoder,
    construct_subnet_mobilenet,
    construct_subnet_resnet,
    construct_subnet_transformer,
    construct_subnet_ultranet,
    construct_subnet_vit,
    kept_groups,
)

__all__ = [
    "construct_subnet_vit",
    "construct_subnet_autoencoder",
    "construct_subnet_mobilenet",
    "construct_subnet_resnet",
    "construct_subnet_transformer",
    "construct_subnet_ultranet",
    "kept_groups",
]
