"""Quantized collectives: int8 ring all-reduce for DP gradient sync.

The reference has no distributed communication at all (SURVEY.md §5); at
multi-host scale the DP gradient all-reduce is pure interconnect time, and
this framework's whole theme is that int8 wires cost 4x less than f32 ones.
Following the EQuARX idea (quantized all-reduce stages inside XLA,
arxiv 2506.17615), :func:`quantized_ring_all_reduce` runs the classic
two-phase ring — reduce-scatter then all-gather — with every hop's payload
dynamically quantized to int8 + one f32 scale per block:

- wire bytes ~ 2 * (N-1)/N * L/4 vs 2 * (N-1)/N * L for the f32 ring — 4x
  less traffic on the slow (DCN) axis;
- accumulation stays f32 on-device: each hop dequantizes, adds its local
  shard, and requantizes, so error grows O(sqrt(hops)) * step, bounded by
  the per-hop dynamic scale (tests assert ~1e-2 relative for int8 across 8
  devices);
- everything is jit-able `shard_map` + `ppermute` code — XLA pipelines the
  hops over ICI/DCN like any collective.

Use :func:`dp_all_reduce_grads` as the drop-in gradient synchronizer: exact
`psum` by default, quantized when told the mesh axis rides a slow fabric.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _quantize_block(x, block: int):
    """[n] f32 -> (int8 levels [n], f32 scales [n/block])."""
    xb = x.reshape(-1, block)
    scale = jnp.maximum(jnp.max(jnp.abs(xb), axis=1, keepdims=True), 1e-30)
    inv = 127.0 / scale
    lv = jnp.clip(jnp.round(xb * inv), -127.0, 127.0).astype(jnp.int8)
    return lv.reshape(-1), (scale * (1.0 / 127.0)).reshape(-1)


def _dequantize_block(lv, scales, block: int):
    return (lv.reshape(-1, block).astype(jnp.float32)
            * scales[:, None]).reshape(-1)


def quantized_ring_all_reduce(x: jax.Array, axis_name: str,
                              block: int = 256) -> jax.Array:
    """Sum ``x`` over ``axis_name`` with int8-quantized ring traffic.

    Call inside shard_map/pmap. Returns the (approximate) sum, identical
    shape/dtype. Exact math path: ``jax.lax.psum``.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    idx = jax.lax.axis_index(axis_name)
    shape, dtype = x.shape, x.dtype
    flat = x.astype(jnp.float32).reshape(-1)
    # pad so the flat vector splits into n chunks of whole blocks
    chunk = -(-flat.shape[0] // (n * block)) * block
    flat = jnp.pad(flat, (0, chunk * n - flat.shape[0]))
    chunks = flat.reshape(n, chunk)

    fwd = [(i, (i + 1) % n) for i in range(n)]

    # phase 1: reduce-scatter. At step s every device sends the chunk it
    # received last step (quantized) to its right neighbour, which adds its
    # own shard. After n-1 steps device d owns the full sum of chunk
    # (d + 1) mod n.
    def rs_step(s, carry):
        acc = carry  # [chunk] f32: the partial sum this device is passing on
        lv, sc = _quantize_block(acc, block)
        lv = jax.lax.ppermute(lv, axis_name, fwd)
        sc = jax.lax.ppermute(sc, axis_name, fwd)
        incoming = _dequantize_block(lv, sc, block)
        # chunk index this device must add at step s+1:
        # it is processing chunk (idx - s - 1) mod n
        ci = (idx - s - 1) % n
        return incoming + jnp.take(chunks, ci, axis=0)

    acc = jnp.take(chunks, idx, axis=0)  # start with own copy of chunk idx
    acc = jax.lax.fori_loop(0, n - 1, rs_step, acc)
    # device d now holds the reduced chunk (d - (n-1)) mod n == (d+1) mod n

    # phase 2: all-gather the reduced chunks (quantized once each); every
    # device dequantizes the SAME payloads, so all replicas end bit-identical
    lv, sc = _quantize_block(acc, block)
    gathered_lv = [lv]
    gathered_sc = [sc]
    for _ in range(n - 1):
        lv = jax.lax.ppermute(lv, axis_name, fwd)
        sc = jax.lax.ppermute(sc, axis_name, fwd)
        gathered_lv.append(lv)
        gathered_sc.append(sc)
    # arrival s (0-based) at device d carries chunk (d - s + 1) mod n; undo
    # the rotation so chunks land in order 0..n-1
    stacked_lv = jnp.stack(gathered_lv)
    stacked_sc = jnp.stack(gathered_sc)
    parts = []
    for ci in range(n):
        # we need the arrival s with (idx - s + 1) mod n == ci
        # -> s = (idx + 1 - ci) mod n
        s = (idx + 1 - ci) % n
        parts.append(_dequantize_block(jnp.take(stacked_lv, s, axis=0),
                                       jnp.take(stacked_sc, s, axis=0),
                                       block))
    out = jnp.concatenate(parts)[: int(np.prod(shape))]
    return out.reshape(shape).astype(dtype)


def dp_all_reduce_grads(grads: Any, axis_name: str = "data",
                        quantized: bool = False, block: int = 256,
                        mean: bool = True) -> Any:
    """Gradient synchronizer for the DP axis: psum (exact) or the int8 ring.

    Call inside the shard_mapped/pmapped step function.
    """
    n = jax.lax.axis_size(axis_name)

    def sync(g):
        if quantized:
            s = quantized_ring_all_reduce(g, axis_name, block=block)
        else:
            s = jax.lax.psum(g, axis_name)
        return s / n if mean else s

    return jax.tree.map(sync, grads)
