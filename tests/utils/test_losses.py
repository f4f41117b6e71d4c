"""Loss math parity vs the reference's torch implementations
(QViT_with_GETA/utils.py:120-194, 268-278)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.utils import (
    one_hot,
    cross_entropy_onehot_target,
    softmax_cross_entropy,
    kd_loss,
    mixup,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_one_hot_label_smoothing_matches_reference_formula():
    labels = np.array([0, 3, 2, 9])
    got = np.asarray(one_hot(jnp.array(labels), 10, smoothing_eps=0.1))

    oh = F.one_hot(torch.tensor(labels), 10).float()
    v1 = 1 - 0.1 + 0.1 / 10.0
    v0 = 0.1 / 10.0
    want = (oh * (v1 - v0) + v0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # plain one-hot
    np.testing.assert_allclose(
        np.asarray(one_hot(jnp.array(labels), 10)), oh.numpy())


def test_cross_entropy_onehot_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    target = np.asarray(one_hot(jnp.array(labels), 10, smoothing_eps=0.1))

    got = float(cross_entropy_onehot_target(jnp.array(logits),
                                            jnp.array(target)))
    lt = torch.tensor(logits)
    tt = torch.tensor(target)
    want = float(-(tt * F.log_softmax(lt, dim=1)).sum(dim=1).mean())
    assert got == pytest.approx(want, rel=1e-5)

    # integer-label CE equals torch CrossEntropyLoss
    got2 = float(softmax_cross_entropy(jnp.array(logits), jnp.array(labels)))
    want2 = float(torch.nn.CrossEntropyLoss()(lt, torch.tensor(labels)))
    assert got2 == pytest.approx(want2, rel=1e-5)


def test_kd_loss_matches_torch_kl_div_batchmean():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((6, 10)).astype(np.float32)
    t = rng.standard_normal((6, 10)).astype(np.float32)
    T = 4.0
    got = float(kd_loss(jnp.array(s), jnp.array(t), T))

    st, tt = torch.tensor(s), torch.tensor(t)
    want = float(
        F.kl_div(F.log_softmax(st / T, dim=1), F.softmax(tt / T, dim=1),
                 reduction="batchmean") * (T * T))
    assert got == pytest.approx(want, rel=1e-5)


def test_mixup_is_convex_combination_preserving_row_sums():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(12.0).reshape(4, 3)
    y = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3)
    mx, my = mixup(rng, x, y, alpha=0.2)
    # Row sums are preserved under any convex combination of permuted rows'
    # total mass per column-sum; per-row target mass stays 1.
    np.testing.assert_allclose(np.asarray(my.sum(axis=1)), 1.0, rtol=1e-6)
    assert mx.shape == x.shape
    # gamma in [0,1]: every mixed pixel within [min, max] of the two sources
    assert float(mx.min()) >= float(x.min()) - 1e-6
    assert float(mx.max()) <= float(x.max()) + 1e-6


def test_group_lasso_loss_sums_scaled_group_norms():
    from quantized_vit_tpu.opt.groups import (
        NodeGroup, ParamEntry, Transform)
    from quantized_vit_tpu.utils import group_lasso_loss

    rng = np.random.default_rng(2)
    w = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    params = {"fc": {"kernel": jnp.array(w), "bias": jnp.array(b)}}
    g = NodeGroup(
        id="fc",
        entries=[ParamEntry("fc/kernel", Transform.OUT),
                 ParamEntry("fc/bias", Transform.ACCESSORY)],
        num_groups=4,
    )
    # unscaled
    want = np.sqrt((w**2).sum(axis=0) + b**2 + 1e-12).sum()
    got = float(group_lasso_loss([g], params))
    assert got == pytest.approx(float(want), rel=1e-5)
    # scaled
    scale = np.array([2.0, 0.5, 1.0, 3.0], np.float32)
    want_s = (np.sqrt((w**2).sum(axis=0) + b**2 + 1e-12) * scale).sum()
    got_s = float(group_lasso_loss([g], params,
                                   {"fc": jnp.array(scale)}))
    assert got_s == pytest.approx(float(want_s), rel=1e-5)
