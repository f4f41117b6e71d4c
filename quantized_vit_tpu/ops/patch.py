"""Patch-embed finalization kernel for the ViT serving path.

After the bf16 level conv (serve/vit_int4.py patch embed), the XLA glue
chain `acc*scale + bias` -> reshape -> concat cls -> + pos_embed -> pad to
n_pad rows costs several full passes + two copies over the [B, 197, 768]
stream (~150us at batch 32). This kernel does all of it in ONE pass per
image, writing the padded 2-D token stream directly:

  rows 0..P-1 : acc*scale + pos_patch   (pos_patch = pos + conv bias,
                                         folded at trace time; P = g*g)
  row  P      : cls + pos_cls  (precomputed [D] row, trace time)
  rows P+1..  : 0  (padding)

The cls token lives at row P (the END of the real tokens) instead of the
reference's row 0 (vit_model.py:120-126): attention is permutation-
invariant over tokens and every other serving op is row-wise, so only the
head's read row changes — and cls-last keeps this kernel's bulk store
sublane-ALIGNED at row 0 (a row-1 start would relayout the whole block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_finalize_kernel(acc_ref, pos_ref, cls_ref, scale_ref, o_ref, *,
                           n_patch: int, n_pad: int):
    body = acc_ref[0] * scale_ref[0, 0] + pos_ref[:]
    o_ref[:n_patch, :] = body.astype(o_ref.dtype)
    o_ref[n_patch:n_patch + 1, :] = cls_ref[:].astype(o_ref.dtype)
    if n_pad > n_patch + 1:
        o_ref[n_patch + 1:, :] = jnp.zeros(
            (n_pad - n_patch - 1, o_ref.shape[1]), o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_pad", "out_dtype",
                                             "interpret"))
def patch_finalize(acc, pos_patch, cls_row, scale, *,
                   n_pad: int, out_dtype=jnp.bfloat16, interpret=False):
    """acc [B, P, D] f32 conv output -> [B*n_pad, D] padded token stream.

    pos_patch: [P, D] positional rows for the patch tokens WITH the conv
    bias already folded in; cls_row: [D] (cls token + its positional row,
    combined at trace time); scale: scalar dequant scale.
    """
    b, p, d = acc.shape
    return pl.pallas_call(
        functools.partial(_patch_finalize_kernel, n_patch=p, n_pad=n_pad),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_pad, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(acc, jnp.asarray(pos_patch, jnp.float32),
      jnp.asarray(cls_row, jnp.float32).reshape(1, d),
      jnp.asarray(scale, jnp.float32).reshape(1, 1))
