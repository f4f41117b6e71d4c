"""Serving: INT4 ViT forward, batch eval, continuous batching."""

from .vit_int4 import (export_vit_int4, vit_int4_forward, QLayerArtifact,
                       random_vit_int4_artifact)
from .batching import ContinuousBatcher, MultiHostFrontend

__all__ = ["export_vit_int4", "vit_int4_forward", "QLayerArtifact",
           "random_vit_int4_artifact", "ContinuousBatcher", "MultiHostFrontend"]
