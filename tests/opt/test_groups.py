"""Group-space transform parity vs the reference transform language
(only_train_once/transform/tensor_transform.py) across the torch<->flax
layout flip, plus mask/index consistency properties."""

import numpy as np
import pytest

import jax.numpy as jnp

from quantized_vit_tpu.opt.groups import (
    NodeGroup,
    ParamEntry,
    Transform,
    group_mask_for_param,
    group_matrix,
    group_sq_norms,
    kept_indices_for_axis,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_tt():
    return load_reference_module(
        "QViT_with_GETA/only_train_once/transform/tensor_transform.py",
        "ref_tensor_transform",
    )


def test_out_transform_matches_reference_basic(ref_tt):
    """flax Dense kernel [in, out] OUT == torch weight [out, in] BASIC."""
    rng = np.random.default_rng(0)
    kernel = rng.standard_normal((7, 5)).astype(np.float32)  # [in, out]
    ours = np.asarray(group_matrix(jnp.array(kernel), Transform.OUT, 5))
    weight = torch.tensor(kernel.T)  # torch layout [out, in]
    ref = ref_tt.tensor_transformation(
        weight, ref_tt.TensorTransform.BASIC, 5).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_out_transform_conv_matches_reference_basic(ref_tt):
    """Conv HWIO [h,w,i,o] OUT == torch OIHW [o,i,h,w] BASIC, same row sets
    (row-internal order may differ; norms must match)."""
    rng = np.random.default_rng(1)
    hwio = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    ours = np.asarray(group_matrix(jnp.array(hwio), Transform.OUT, 6))
    oihw = torch.tensor(np.ascontiguousarray(hwio.transpose(3, 2, 0, 1)))
    ref = ref_tt.tensor_transformation(
        oihw, ref_tt.TensorTransform.BASIC, 6).numpy()
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=1), np.linalg.norm(ref, axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(np.sort(ours, 1), np.sort(ref, 1), rtol=1e-6)


def test_qkv_heads_matches_reference_chained_transform(ref_tt):
    """Fused qkv chained MULTIHEAD_HEADDIM->MULTIHEAD_NUMHEAD
    (operator.py:1188-1205): per-head rows hold the same values."""
    in_dim, H, hd = 5, 3, 4
    rng = np.random.default_rng(2)
    kernel = rng.standard_normal((in_dim, 3 * H * hd)).astype(np.float32)
    ours = np.asarray(
        group_matrix(jnp.array(kernel), Transform.QKV_HEADS, H, num_heads=H)
    )
    weight = torch.tensor(kernel.T)  # [3*H*hd, in]
    param_group = {"num_groups": H, "num_heads": H}
    chained = [
        (ref_tt.TensorTransform.MULTIHEAD_HEADDIM,
         {"head_dim": H * hd, "num_heads": 3}),
        (ref_tt.TensorTransform.MULTIHEAD_NUMHEAD, {"num_heads": H}),
    ]
    ref = ref_tt.tensor_transformation_param_group(
        weight, chained, param_group).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=1), np.linalg.norm(ref, axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(np.sort(ours, 1), np.sort(ref, 1), rtol=1e-5)


@pytest.mark.parametrize(
    "shape,tf,G,H",
    [
        ((7, 5), Transform.OUT, 5, 1),
        ((3, 3, 4, 6), Transform.OUT, 6, 1),
        ((6,), Transform.ACCESSORY, 6, 1),
        ((8, 10), Transform.IN, 8, 1),
        ((5, 24), Transform.QKV_HEADS, 2, 2),
        ((24,), Transform.QKV_HEADS, 2, 2),
        ((5, 8), Transform.HEADS, 2, 2),
    ],
)
def test_mask_expansion_consistent_with_group_matrix(shape, tf, G, H):
    """Zeroing via expanded mask must zero exactly the group_matrix rows."""
    rng = np.random.default_rng(3)
    p = jnp.array(rng.standard_normal(shape).astype(np.float32)) + 1.0
    mask = np.zeros((G,), np.float32)
    mask[0] = 1.0
    m = group_mask_for_param(jnp.array(mask), tf, shape, H)
    zeroed = p * (1.0 - m)
    gm = np.asarray(group_matrix(zeroed, tf, G, H))
    assert np.all(gm[0] == 0.0)
    for i in range(1, G):
        assert np.linalg.norm(gm[i]) > 0


@pytest.mark.parametrize(
    "tf,axis,G,H",
    [
        (Transform.OUT, 6, 6, 1),
        (Transform.QKV_HEADS, 24, 2, 2),
        (Transform.HEADS, 8, 2, 2),
    ],
)
def test_kept_indices_complement_mask(tf, axis, G, H):
    kept = np.array([i for i in range(G) if i != 0])
    idx = kept_indices_for_axis(kept, tf, axis, H)
    mask = np.asarray(group_mask_for_param(
        jnp.array((np.arange(G) == 0).astype(np.float32)), tf, (axis,), H))
    # kept indices are exactly the zero entries of the pruned-group mask
    np.testing.assert_array_equal(np.sort(idx), np.nonzero(mask == 0)[0])


def test_group_sq_norms_sums_entries():
    rng = np.random.default_rng(4)
    k = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    tree = {"lay": {"kernel": jnp.array(k), "bias": jnp.array(b)}}
    g = NodeGroup(
        id="lay",
        entries=[ParamEntry("lay/kernel", Transform.OUT),
                 ParamEntry("lay/bias", Transform.ACCESSORY)],
        num_groups=3,
    )
    got = np.asarray(group_sq_norms(g, tree))
    want = (k**2).sum(0) + b**2
    np.testing.assert_allclose(got, want, rtol=1e-6)
