"""In-kernel RDMA gather (ops/ring_gather.py) under TPU interpret mode.

Remote DMAs are simulated on the virtual CPU mesh (conftest forces 8 CPU
devices), so the cross-device semantics — barrier, pushes into peer
buffers, semaphore drains — execute for real, not as mocks. The gather
must be bit-identical to ``jax.lax.all_gather(axis=0, tiled=True)`` and
the fused compute bit-identical to the plain fused_mlp XLA mirror.

Reference behavior being replaced: the XLA all-gathers of
serve/vit_fsdp.py, which the round-4 schedule audit measured fully
synchronous (docs/SCALING.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.pallas import tpu as pltpu

from quantized_vit_tpu.ops import fused_mlp_xla
from quantized_vit_tpu.ops.ring_gather import (check_row_shards,
                                               fused_mlp_gather,
                                               gather_rows)

# eager DMA execution: the default "on_wait" simulation is orders of
# magnitude slower for multi-program kernels (measured: a tiny
# fused_mlp_gather at tp=4 exceeded 400 s; eager runs it in ~2 s)
IP = pltpu.InterpretParams(dma_execution_mode="eager")


def _mesh(tp):
    devs = jax.devices()
    if len(devs) < tp:
        pytest.skip(f"needs {tp} devices")
    return Mesh(np.array(devs[:tp]).reshape(tp), axis_names=("model",))


@pytest.mark.parametrize("tp", [2, 4])
def test_gather_rows_matches_xla_all_gather(tp):
    mesh = _mesh(tp)
    rng = np.random.default_rng(0)
    full = [jnp.array(rng.integers(-7, 8, (32 * tp, 256)), jnp.int8),
            jnp.array(rng.integers(-128, 128, (64 * tp, 128)), jnp.int8)]

    def body(*shards):
        return tuple(gather_rows(shards, axis_name="model", tp=tp,
                                 interpret=IP))

    fn = jax.shard_map(body, mesh=mesh, in_specs=(P("model", None),) * 2,
                       out_specs=(P(),) * 2, check_vma=False)
    outs = fn(*[jax.device_put(f, NamedSharding(mesh, P("model", None)))
                for f in full])
    for f, o in zip(full, outs):
        assert np.array_equal(np.asarray(f), np.asarray(o))


def test_row_shard_validation():
    with pytest.raises(ValueError, match="sublane"):
        check_row_shards([jnp.zeros((24, 128), jnp.int8)])  # 24 % 32 != 0
    check_row_shards([jnp.zeros((64, 128), jnp.int8),
                      jnp.zeros((16, 128), jnp.bfloat16)])


@pytest.mark.parametrize("tp", [2])
def test_fused_mlp_gather_compute_and_gather_parity(tp):
    mesh = _mesh(tp)
    rng = np.random.default_rng(1)
    k = hid = 128
    m = 32
    x = jnp.array(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
    w1 = jnp.array(rng.integers(-7, 8, (k, hid)), jnp.int8)
    w2 = jnp.array(rng.integers(-7, 8, (hid, k)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(hid) * 0.01, jnp.float32)
    b2 = jnp.array(rng.standard_normal(k) * 0.01, jnp.float32)
    g = jnp.array(rng.standard_normal(k) * 0.1 + 1.0, jnp.float32)
    be = jnp.array(rng.standard_normal(k) * 0.01, jnp.float32)
    kw = dict(ln_scale=g, ln_bias=be, act_d=jnp.float32(0.05),
              act_t=jnp.float32(1.0), act_top=127,
              hid_d=jnp.float32(0.05), hid_t=jnp.float32(1.0),
              hid_top=127, out_dtype=jnp.float32)
    nxt = [jnp.array(rng.integers(-7, 8, (32 * tp, k)), jnp.int8),
           jnp.array(rng.integers(-7, 8, (64 * tp, k)), jnp.int8)]

    def body(x, s0, s1):
        y, gath = fused_mlp_gather(
            x, w1, jnp.float32(1e-3), b1, w2, jnp.float32(1e-3), b2,
            next_shards=[s0, s1], axis_name="model", tp=tp, fmt="int8",
            interpret=IP, **kw)
        return (y, *gath)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("model", None), P("model", None)),
        out_specs=(P(), P(), P()), check_vma=False)
    y, g0, g1 = fn(x, *[jax.device_put(s, NamedSharding(mesh,
                                                        P("model", None)))
                        for s in nxt])
    want = fused_mlp_xla(x, w1, jnp.float32(1e-3), b1, w2,
                         jnp.float32(1e-3), b2, fmt="int8", **kw)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32), atol=1e-5)
    assert np.array_equal(np.asarray(g0), np.asarray(nxt[0]))
    assert np.array_equal(np.asarray(g1), np.asarray(nxt[1]))


def test_fused_mlp_gather_rejects_int4_compute():
    with pytest.raises(ValueError, match="int8"):
        fused_mlp_gather(
            jnp.zeros((32, 128), jnp.bfloat16),
            jnp.zeros((64, 128), jnp.int8), 1e-3, None,
            jnp.zeros((64, 128), jnp.int8), 1e-3, None,
            next_shards=[], axis_name="model", tp=2, fmt="int4",
            ln_scale=jnp.ones(128), ln_bias=jnp.zeros(128),
            act_d=0.05, act_top=7, hid_d=0.05, hid_top=7)
