"""Quantized int8 ring all-reduce (EQuARX-style) on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from quantized_vit_tpu.parallel.collectives import (
    dp_all_reduce_grads,
    quantized_ring_all_reduce,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs the 8-device CPU mesh")


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("data",))


def _run_allreduce(x_all, fn, mesh):
    """x_all: [n, ...] per-device values; returns each device's result."""
    f = shard_map(fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    return jax.jit(f)(x_all)


@needs_8
def test_quantized_ring_matches_psum_within_int8_error():
    mesh = _mesh()
    rng = np.random.default_rng(0)
    x_all = jnp.array(rng.standard_normal((8, 1, 1000)), jnp.float32)

    def ring(x):
        return quantized_ring_all_reduce(x[0], "data", block=100)[None]

    def exact(x):
        return jax.lax.psum(x[0], "data")[None]

    got = np.asarray(_run_allreduce(x_all, ring, mesh))
    want = np.asarray(_run_allreduce(x_all, exact, mesh))
    # every replica holds the same result
    assert np.array_equal(got[0], got[3])
    # per-hop requantization: worst-element error ~ 3/127 * sqrt(hops)
    # (~7% at 7 hops for N(0,1) data) — the EQuARX tradeoff
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 0.15
    assert np.mean(np.abs(got - want) / denom) < 0.02


@needs_8
def test_quantized_ring_handles_ragged_and_multidim():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    # 7 * 13 elements: not divisible by n*block -> exercises padding
    x_all = jnp.array(rng.standard_normal((8, 1, 7, 13)), jnp.float32)

    def ring(x):
        return quantized_ring_all_reduce(x[0], "data", block=16)[None]

    def exact(x):
        return jax.lax.psum(x[0], "data")[None]

    got = np.asarray(_run_allreduce(x_all, ring, mesh))
    want = np.asarray(_run_allreduce(x_all, exact, mesh))
    assert got.shape == want.shape
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 0.15


@needs_8
def test_dp_all_reduce_grads_exact_mode_is_psum_mean():
    mesh = _mesh()
    rng = np.random.default_rng(2)
    g_all = {"w": jnp.array(rng.standard_normal((8, 1, 64)), jnp.float32),
             "b": jnp.array(rng.standard_normal((8, 1, 8)), jnp.float32)}

    def sync(g):
        g_local = jax.tree.map(lambda a: a[0], g)
        out = dp_all_reduce_grads(g_local, "data", quantized=False)
        return jax.tree.map(lambda a: a[None], out)

    f = shard_map(sync, mesh=mesh, in_specs=(P("data"),),
                  out_specs=P("data"))
    got = jax.jit(f)(g_all)
    np.testing.assert_allclose(
        np.asarray(got["w"][0, 0]),
        np.asarray(jnp.mean(g_all["w"], axis=0)[0]), rtol=1e-5, atol=1e-6)


@needs_8
def test_dp_all_reduce_grads_quantized_tree():
    mesh = _mesh()
    rng = np.random.default_rng(3)
    g_all = {"w": jnp.array(rng.standard_normal((8, 1, 512)), jnp.float32)}

    def sync(g):
        g_local = jax.tree.map(lambda a: a[0], g)
        out = dp_all_reduce_grads(g_local, "data", quantized=True, block=64)
        return jax.tree.map(lambda a: a[None], out)

    f = shard_map(sync, mesh=mesh, in_specs=(P("data"),),
                  out_specs=P("data"))
    got = np.asarray(jax.jit(f)(g_all)["w"][0])
    want = np.asarray(jnp.mean(g_all["w"], axis=0)[0])
    denom = np.maximum(np.abs(want), 0.5)
    assert np.max(np.abs(got - want) / denom) < 0.2
    assert np.mean(np.abs(got - want) / denom) < 0.03
