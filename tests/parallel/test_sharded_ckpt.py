"""Sharded (orbax) checkpoint save/restore on the virtual 8-device mesh.

Covers the SURVEY.md §5 checkpoint/resume mandate: sharded arrays keyed by
logical names + manifest with quant/prune metadata, restorable onto a
DIFFERENT mesh topology than the one that wrote it (elastic resume).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_vit_tpu.parallel import (
    restore_sharded_checkpoint,
    save_sharded_checkpoint,
    scan_sharded_checkpoint,
    shard_params,
)


def _tiny_vit_tree(rng):
    # paths chosen to exercise the VIT_PARTITION_RULES regexes
    return {
        "blocks_0": {
            "attn": {
                "qkv": {"kernel": rng.standard_normal((16, 48)),
                        "bias": rng.standard_normal((48,))},
                "proj": {"kernel": rng.standard_normal((16, 16)),
                         "bias": rng.standard_normal((16,))},
            },
            "mlp": {
                "fc1": {"kernel": rng.standard_normal((16, 64)),
                        "bias": rng.standard_normal((64,))},
                "fc2": {"kernel": rng.standard_normal((64, 16)),
                        "bias": rng.standard_normal((16,))},
            },
        },
        "norm": {"scale": rng.standard_normal((16,))},
    }


def _as_f32(tree):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)


def test_roundtrip_same_mesh(mesh8, tmp_path):
    rng = np.random.default_rng(0)
    host = _as_f32(_tiny_vit_tree(rng))
    sharded = shard_params(host, mesh8)

    extra = {"bit_layers": {"blocks_0/attn/qkv": 4.0}, "num_steps": 123}
    path = save_sharded_checkpoint(str(tmp_path / "ckpt_10"), sharded, extra)

    restored, extra2 = restore_sharded_checkpoint(path, mesh=mesh8)
    assert extra2 == extra
    for (kp1, a), (kp2, b) in zip(
        jax.tree_util.tree_flatten_with_path(host)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        assert kp1 == kp2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))

    # column-sharded qkv kernel restored sharded over 'model', not gathered
    qkv = restored["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    assert len(qkv.sharding.device_set) == 8


def test_restore_onto_different_topology(mesh8, tmp_path):
    rng = np.random.default_rng(1)
    host = _as_f32(_tiny_vit_tree(rng))
    sharded = shard_params(host, mesh8)  # written on a 2x4 mesh
    path = save_sharded_checkpoint(str(tmp_path / "ckpt_20"), sharded)

    other = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    restored, _ = restore_sharded_checkpoint(path, mesh=other)
    fc1 = restored["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.mesh.shape == {"data": 4, "model": 2}
    np.testing.assert_allclose(
        np.asarray(fc1), np.asarray(host["blocks_0"]["mlp"]["fc1"]["kernel"]))


def test_restore_unsharded_and_scan(mesh8, tmp_path):
    rng = np.random.default_rng(2)
    host = _as_f32(_tiny_vit_tree(rng))
    sharded = shard_params(host, mesh8)
    save_sharded_checkpoint(str(tmp_path / "ckpt_5"), sharded)
    save_sharded_checkpoint(str(tmp_path / "ckpt_40"), sharded)

    latest = scan_sharded_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt_40")

    restored, _ = restore_sharded_checkpoint(latest, mesh=None)
    np.testing.assert_allclose(
        np.asarray(restored["norm"]["scale"]),
        np.asarray(host["norm"]["scale"]))
