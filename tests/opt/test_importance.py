"""Importance-score parity vs the reference criteria functions
(only_train_once/optimizer/importance_score/) on a synthetic param group."""

import numpy as np
import pytest

import jax.numpy as jnp

from quantized_vit_tpu.opt.groups import NodeGroup, ParamEntry, Transform
from quantized_vit_tpu.opt.importance import (
    DEFAULT_CRITERIA,
    combine_importance_scores,
    raw_scores,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_scores():
    # importance_score modules do `from only_train_once.transform import …`;
    # stub that package with the directly-loaded tensor_transform module so
    # we never execute the reference package __init__ (which pulls in the
    # whole tracer stack).
    import sys
    import types

    tt = load_reference_module(
        "QViT_with_GETA/only_train_once/transform/tensor_transform.py",
        "ref_tt2")
    pkg = types.ModuleType("only_train_once")
    trans = types.ModuleType("only_train_once.transform")
    for name in ("tensor_transformation", "TensorTransform",
                 "tensor_transformation_param_group"):
        setattr(trans, name, getattr(tt, name))
    pkg.transform = trans
    sys.modules.setdefault("only_train_once", pkg)
    sys.modules["only_train_once.transform"] = trans
    try:
        mag = load_reference_module(
            "QViT_with_GETA/only_train_once/optimizer/importance_score/magnitude.py",
            "ref_is_magnitude")
        cos = load_reference_module(
            "QViT_with_GETA/only_train_once/optimizer/importance_score/cosine_similarity.py",
            "ref_is_cos")
        tay = load_reference_module(
            "QViT_with_GETA/only_train_once/optimizer/importance_score/taylor.py",
            "ref_is_taylor")
    finally:
        sys.modules.pop("only_train_once.transform", None)
        if sys.modules.get("only_train_once") is pkg:
            sys.modules.pop("only_train_once", None)
    return mag, cos, tay, tt


def _setup(seed=0, out=6, inp=4):
    rng = np.random.default_rng(seed)
    k = rng.standard_normal((inp, out)).astype(np.float64)
    b = rng.standard_normal((out,)).astype(np.float64)
    gk = rng.standard_normal((inp, out)).astype(np.float64)
    gb = rng.standard_normal((out,)).astype(np.float64)
    return k, b, gk, gb


def _ref_param_group(tt, k, b, gk, gb):
    return {
        "p_names": ["lay.weight", "lay.bias"],
        "params": [torch.tensor(k.T), torch.tensor(b)],
        "p_transform": [tt.TensorTransform.BASIC, tt.TensorTransform.ACCESSORY],
        "num_groups": k.shape[1],
        "grad_variant": {
            "lay.weight": torch.tensor(gk.T),
            "lay.bias": torch.tensor(gb),
        },
        "importance_scores": {},
    }


def _our_group_and_trees(k, b, gk, gb):
    g = NodeGroup(
        id="lay",
        entries=[ParamEntry("lay/kernel", Transform.OUT),
                 ParamEntry("lay/bias", Transform.ACCESSORY)],
        num_groups=k.shape[1],
    )
    params = {"lay": {"kernel": jnp.array(k), "bias": jnp.array(b)}}
    gv = {"lay": {"kernel": jnp.array(gk), "bias": jnp.array(gb)}}
    return g, params, gv


def test_raw_scores_match_reference(ref_scores):
    mag, cos, tay, tt = ref_scores
    k, b, gk, gb = _setup()
    pg = _ref_param_group(tt, k, b, gk, gb)
    mag.importance_score_by_magnitude(pg)
    mag.importance_score_by_avg_magnitude(pg)
    cos.importance_score_by_cosine_similarity(pg)
    tay.importance_score_by_first_order_taylor(pg)
    tay.importance_score_by_second_order_taylor(pg)

    g, params, gv = _our_group_and_trees(k, b, gk, gb)
    ours = raw_scores(g, params, gv, list(DEFAULT_CRITERIA))

    for name, ref_key in [
        ("magnitude", "magnitude"),
        ("avg_magnitude", "avg_magnitude"),
        ("cosine_similarity", "cosine_similarity"),
        ("taylor_first_order", "taylor_first_order"),
        ("taylor_second_order", "taylor_second_order"),
    ]:
        np.testing.assert_allclose(
            np.asarray(ours[name]), pg["importance_scores"][ref_key].numpy(),
            rtol=1e-5, err_msg=name,
        )


def test_combine_normalization_properties():
    """Combined scores: positive weights, global L2-normalized criteria;
    gl_scale mean-normalized to ~1 and clamped band respected."""
    k, b, gk, gb = _setup(seed=1)
    k2, b2, gk2, gb2 = _setup(seed=2, out=10, inp=3)
    g1, p1, v1 = _our_group_and_trees(k, b, gk, gb)
    g2 = NodeGroup(
        id="lay2",
        entries=[ParamEntry("lay2/kernel", Transform.OUT),
                 ParamEntry("lay2/bias", Transform.ACCESSORY)],
        num_groups=10,
    )
    params = {**p1, "lay2": {"kernel": jnp.array(k2), "bias": jnp.array(b2)}}
    gv = {**v1, "lay2": {"kernel": jnp.array(gk2), "bias": jnp.array(gb2)}}
    scores, gl = combine_importance_scores([g1, g2], params, gv)
    assert scores.shape == (16,)
    assert np.all(np.isfinite(np.asarray(scores)))
    allgl = np.concatenate([np.asarray(x) for x in gl])
    assert allgl.shape == (16,)
    # mean-normalized
    np.testing.assert_allclose(allgl.mean(), 1.0, rtol=1e-5)
    assert np.all(allgl > 0)
