"""Conv autoencoder — the proof point for ConvTranspose and GroupNorm
pruning support.

The reference's operator library covers transposed convolutions
(ConvTranspose2dOTO, operator.py:291-349, pruned via its TRANSPOSE
transform) and group/instance normalization (InstanceNorm2dOTO /
GroupNormOTO, operator.py:387-457) whose pruning granularity is the norm's
group count: the pzig partition overwrites member transforms to
MULTIHEAD_NUMHEAD_SPREAD so channels are kept/dropped in whole norm groups
(pruning_dependency.py:426-538). This module provides the flax family that
exercises both:

- encoder: stages of [QuantConv stride 2 -> GroupNorm -> GELU]
- decoder: stages of [QuantConvTranspose stride 2 -> GroupNorm -> GELU]
- final 1x1 QuantConv back to the input channel count (adjacent to the
  model output -> unprunable)

Channels are pruned in whole GroupNorm groups, which keeps each remaining
group's normalization statistics bit-identical after compression — so the
compressed config carries the per-stage group count (``enc_norm_groups`` /
``dec_norm_groups``) rather than recomputing it from the shrunken width.
InstanceNorm is the norm_groups == channels special case, LayerNorm-over-
channels the norm_groups == 1 case; both ride the same machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import QuantConfig, QuantConv, QuantConvTranspose


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    widths: Tuple[int, ...] = (16, 32)   # encoder stage widths
    norm_groups: int = 4                 # default GroupNorm groups per stage
    in_channels: int = 3
    kernel_size: int = 3
    quant: QuantConfig = QuantConfig.off()
    # Compressed-subnet overrides (None = dense model): decoder widths and
    # per-stage norm group counts.
    # U-Net-style skip connections: decoder stage j's output concatenates
    # with the spatially-matched encoder feature before feeding the next
    # decoder conv — the concat-fed in-dim wiring of the reference's
    # auxiliary groups (pruning_dependency.py:152-201 step 8,
    # node_group.py:241-254 offset bookkeeping), exercised at compression
    # time by slicing each segment with its producer's kept indices plus
    # the segment offset.
    skip_concat: bool = False
    dec_widths: Optional[Tuple[int, ...]] = None
    enc_norm_groups: Optional[Tuple[int, ...]] = None
    dec_norm_groups: Optional[Tuple[int, ...]] = None

    @property
    def decoder_widths(self) -> Tuple[int, ...]:
        """One upsample per encoder downsample; mirrors the encoder by
        default, ending at widths[0] before the 1x1 output conv."""
        if self.dec_widths is not None:
            return self.dec_widths
        return tuple(reversed(self.widths[:-1])) + (self.widths[0],)

    def enc_groups(self, i: int) -> int:
        if self.enc_norm_groups is not None:
            return self.enc_norm_groups[i]
        return min(self.norm_groups, self.widths[i])

    def dec_groups(self, i: int) -> int:
        if self.dec_norm_groups is not None:
            return self.dec_norm_groups[i]
        return min(self.norm_groups, self.decoder_widths[i])


class ConvAutoencoder(nn.Module):
    cfg: AutoencoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ks = (c.kernel_size, c.kernel_size)
        feats = []
        for i, w in enumerate(c.widths):
            x = QuantConv(features=w, kernel_size=ks, strides=(2, 2),
                          padding="SAME", config=c.quant, use_bias=False,
                          name=f"enc_{i}")(x)
            x = nn.GroupNorm(num_groups=c.enc_groups(i),
                             name=f"enc_gn_{i}")(x)
            x = nn.gelu(x)
            feats.append(x)
        n_enc = len(c.widths)
        for i, w in enumerate(c.decoder_widths):
            x = QuantConvTranspose(features=w, kernel_size=ks,
                                   strides=(2, 2), padding="SAME",
                                   config=c.quant, use_bias=False,
                                   name=f"dec_{i}")(x)
            x = nn.GroupNorm(num_groups=c.dec_groups(i),
                             name=f"dec_gn_{i}")(x)
            x = nn.gelu(x)
            mirror = n_enc - 2 - i
            if c.skip_concat and mirror >= 0:
                x = jnp.concatenate([x, feats[mirror]], axis=-1)
        x = QuantConv(features=c.in_channels, kernel_size=(1, 1),
                      padding="VALID", config=c.quant, name="out_conv")(x)
        return x
