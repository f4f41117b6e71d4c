"""HESSO pruning-only optimizer: decay schedule drives redundant groups to
zero and hits the target group sparsity (hesso.py:128-180 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.opt import HESSO, HESSOConfig
from quantized_vit_tpu.opt.groups import NodeGroup, ParamEntry, Transform


def _toy(seed=0, out=8):
    rng = np.random.default_rng(seed)
    params = {
        "fc1": {"kernel": jnp.array(rng.standard_normal((6, out)),
                                    jnp.float32),
                "bias": jnp.array(rng.standard_normal(out), jnp.float32)},
        "fc2": {"kernel": jnp.array(rng.standard_normal((out, 4)),
                                    jnp.float32)},
    }
    groups = [
        NodeGroup(id="fc1",
                  entries=[ParamEntry("fc1/kernel", Transform.OUT),
                           ParamEntry("fc1/bias", Transform.ACCESSORY)],
                  num_groups=out),
        NodeGroup(id="fc2", entries=[ParamEntry("fc2/kernel", Transform.OUT)],
                  num_groups=4, is_prunable=False),
    ]
    return params, groups


def _grads_like(params, scale=1e-3, seed=1):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda p: jnp.array(rng.standard_normal(p.shape) * scale,
                            jnp.float32), params)


def test_hesso_prunes_to_target_sparsity():
    params, groups = _toy()
    opt = HESSO(groups, params, HESSOConfig(
        lr=1e-3, target_group_sparsity=0.5,
        start_pruning_step=2, pruning_steps=10, pruning_periods=2))

    for step in range(16):
        params = opt.step(params, _grads_like(params, seed=step))

    m = opt.compute_metrics(params)
    # 8 prunable groups * 0.5 = 4 redundant, all hard-zeroed by now
    assert m["num_zero_groups"] == 4, m
    assert m["group_sparsity"] == pytest.approx(0.5)

    # pruned rows are exactly zero in kernel AND bias
    k = np.asarray(params["fc1"]["kernel"])
    b = np.asarray(params["fc1"]["bias"])
    zero_cols = np.where((np.abs(k).sum(axis=0) == 0))[0]
    assert len(zero_cols) == 4
    assert (b[zero_cols] == 0).all()
    # unprunable fc2 untouched by pruning
    assert (np.abs(np.asarray(params["fc2"]["kernel"])).sum(axis=0) > 0).all()


def test_hesso_decay_is_gradual_within_period():
    params, groups = _toy()
    opt = HESSO(groups, params, HESSOConfig(
        lr=0.0, target_group_sparsity=0.25,
        start_pruning_step=1, pruning_steps=8, pruning_periods=1))

    norms_hist = []
    for step in range(9):
        params = opt.step(params, _grads_like(params, scale=0.0))
        k = np.asarray(params["fc1"]["kernel"])
        norms_hist.append(np.sort(np.linalg.norm(k, axis=0)))

    # with lr=0 the only change is redundant decay: the 2 smallest-importance
    # groups shrink monotonically to 0 while others stay fixed
    first, last = norms_hist[1], norms_hist[-1]
    assert (last[:2] == 0).all()
    np.testing.assert_allclose(first[2:], last[2:], rtol=1e-6)
    mids = [h[0] for h in norms_hist[1:-1]]
    assert all(mids[i] >= mids[i + 1] - 1e-7 for i in range(len(mids) - 1))
