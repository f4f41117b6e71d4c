"""Shared poke-chain timing harness for the measurement tools.

The ONE copy of the only-valid-on-the-axon-tunnel timing method (the
tunnel adds a ~25 ms RPC floor per dispatch and ``block_until_ready``
does not truly block — docs/PERFORMANCE.md "Measurement methodology"):

1. chain ITERS forwards inside ONE jit via ``lax.fori_loop`` with a REAL
   data dependency between iterations — an O(1) ``dynamic_update_slice``
   poke of one input element (a full-array carry add costs ~47 us/iter of
   HBM traffic at batch 32; ``x + c*0`` gets constant-folded and the body
   hoisted).
2. force completion with a host scalar read (``float(...)``).
3. measure the floor with an empty jit (min over >=3 calls) and subtract.

``bench.py`` at the repo root keeps its own inline copy DELIBERATELY: the
driver runs it as a standalone artifact and it must not depend on tools/.
Any change to the method goes here AND in bench.py (two places, both
documented) — not in per-tool copies.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

REPS = 3


def timeit(fn, *args, reps: int = REPS) -> float:
    """Min wall time of ``float(fn(*args))`` over ``reps`` calls after two
    warmups (compile + cache)."""
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def poke(imgs, s):
    """O(1) data-dependency poke: write a scalar derived from ``s`` into
    one element of ``imgs`` (not foldable, not hoistable)."""
    upd = (s - s + jnp.ones((), jnp.float32)).astype(imgs.dtype)
    return jax.lax.dynamic_update_slice(
        imgs, upd.reshape((1,) * imgs.ndim), (0,) * imgs.ndim)


def make_chain(step_fn, iters: int):
    """jit(chain(art, images) -> scalar) running ``step_fn(art, images)``
    ``iters`` times with the poke dependency. ``art`` is a jit ARGUMENT —
    a closure-captured artifact lowers to inline MLIR literals and
    overflows the remote-compile request at ViT-L size (docs/KERNELS.md
    #8)."""
    @jax.jit
    def chain(art, images):
        def body(i, carry):
            imgs, acc = carry
            logits = step_fn(art, imgs)
            return (poke(imgs, logits[0, 0]), acc + logits[0, 0])
        _, acc = jax.lax.fori_loop(0, iters, body, (images, jnp.float32(0)))
        return acc

    return chain


def measure_floor() -> float:
    """The tunnel RPC floor: an empty jit round trip (min of REPS)."""
    @jax.jit
    def empty(x):
        return jnp.sum(x)

    return timeit(empty, jnp.ones((8,), jnp.float32))
