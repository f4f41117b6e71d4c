"""Artifact serialization roundtrip + native packer parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.artifact import (
    load_artifact_tree,
    save_artifact_tree,
    native_available,
    pack_int4_host,
    unpack_int4_host,
    quantize_levels_host,
)
from quantized_vit_tpu.quant import pack_int4, unpack_int4


def test_tree_roundtrip_preserves_structure_and_values(tmp_path):
    from quantized_vit_tpu.serve.vit_int4 import QLayerArtifact

    rng = np.random.default_rng(0)
    tree = {
        "a": jnp.array(rng.standard_normal((3, 4)), jnp.float32),
        "nested": {"b": jnp.arange(5), "none": None, "s": "hello",
                   "f": 2.5, "flag": True},
        "lst": [jnp.ones(2), {"c": jnp.zeros(3)}],
        "tup": (1, 2, 3),
        "q": QLayerArtifact(
            w=jnp.array(rng.integers(-8, 8, (4, 8)), jnp.int8),
            scale=jnp.float32(0.01), bias=None,
            act={"d": jnp.float32(0.1)},
            fmt="int4", act_pow=False, top=7),
    }
    save_artifact_tree(str(tmp_path / "art"), tree, {"k": "v"})
    got, meta = load_artifact_tree(str(tmp_path / "art"))

    assert meta == {"k": "v"}
    np.testing.assert_array_equal(np.asarray(got["a"]),
                                  np.asarray(tree["a"]))
    assert got["nested"]["none"] is None
    assert got["nested"]["s"] == "hello"
    assert got["nested"]["f"] == 2.5
    assert got["nested"]["flag"] is True
    assert got["tup"] == (1, 2, 3)
    assert isinstance(got["lst"], list)
    q = got["q"]
    assert q.fmt == "int4" and q.act_pow is False and q.bias is None
    assert q.top == 7
    np.testing.assert_array_equal(np.asarray(q.w), np.asarray(tree["q"].w))
    assert float(q.act["d"]) == pytest.approx(0.1)


def test_native_pack_matches_jnp_pack():
    rng = np.random.default_rng(1)
    lv = rng.integers(-8, 8, (64, 48)).astype(np.int8)
    want = np.asarray(pack_int4(jnp.array(lv), axis=0))
    got = pack_int4_host(lv)
    np.testing.assert_array_equal(got, want)
    # roundtrip
    np.testing.assert_array_equal(unpack_int4_host(got), lv)
    # jnp unpack agrees too
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(jnp.array(got), axis=0)), lv)


def test_native_library_builds():
    # The toolchain is baked into this image; the native path must be live,
    # not silently falling back.
    assert native_available()


def test_quantize_levels_matches_numpy():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    scale = rng.uniform(0.01, 0.1, 16).astype(np.float32)
    got = quantize_levels_host(w, scale, -8, 7)
    want = np.clip(np.rint(w / scale[None, :]), -8, 7).astype(np.int8)
    # rint rounds half-to-even, the C++ rounds half-away; ties are
    # measure-zero for random floats — require exact match here
    np.testing.assert_array_equal(got, want)
