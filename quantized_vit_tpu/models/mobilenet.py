"""Depthwise-separable CNN (MobileNet-style) — the depthwise-merge proof
point for the pruning-dependency machinery.

The reference's pzig partition has a dedicated step for depthwise convs
(dependency_graph/pruning_dependency.py:203-238): a depthwise conv cannot
choose its own channels — its per-channel kernels are locked to whatever
the producing layer keeps — so its node group is MERGED into the incoming
group, and its BN rides along as ACCESSORY. This family exercises exactly
that: stem conv -> N x [depthwise 3x3 -> BN -> ReLU -> pointwise 1x1 ->
BN -> ReLU] -> GAP -> head, all LSFQ-quantizable.

Compressed subnets are explicit configs (``widths``); slicing group i's
channels cuts the producing conv's out-dim, its BN, the NEXT depthwise
kernel's channel axis + BN, and the next pointwise kernel's in-dim
(compress/subnet.py construct_subnet_mobilenet).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import QuantConfig, QuantConv, QuantDense


@dataclasses.dataclass(frozen=True)
class MobileNetConfig:
    widths: Tuple[int, ...] = (16, 32, 64)   # pointwise out-channels
    strides: Tuple[int, ...] = (1, 2, 2)     # depthwise stride per block
    stem_width: int = 8
    num_classes: int = 10
    in_channels: int = 3
    quant: QuantConfig = QuantConfig.off()


class MobileNet(nn.Module):
    cfg: MobileNetConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg

        def bn(name):
            return nn.BatchNorm(use_running_average=deterministic,
                                momentum=0.9, epsilon=1e-5, name=name)

        x = QuantConv(features=c.stem_width, kernel_size=(3, 3),
                      strides=(1, 1), padding="SAME", config=c.quant,
                      use_bias=False, name="stem_conv")(x)
        x = nn.relu(bn("stem_bn")(x))
        for i, (width, stride) in enumerate(zip(c.widths, c.strides)):
            ch = x.shape[-1]
            x = QuantConv(features=ch, kernel_size=(3, 3),
                          strides=(stride, stride), padding="SAME",
                          config=c.quant, use_bias=False,
                          feature_group_count=ch, name=f"dw_{i}")(x)
            x = nn.relu(bn(f"dw_bn_{i}")(x))
            x = QuantConv(features=width, kernel_size=(1, 1),
                          strides=(1, 1), padding="VALID", config=c.quant,
                          use_bias=False, name=f"pw_{i}")(x)
            x = nn.relu(bn(f"pw_bn_{i}")(x))
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(features=c.num_classes, config=c.quant,
                          name="head")(x)


def mobilenet_small(num_classes=10, quant=QuantConfig.off()):
    return MobileNet(MobileNetConfig(num_classes=num_classes, quant=quant))
