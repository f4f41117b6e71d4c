"""HESSO-CRIC: cyclic redundancy identification (hesso_cric.py:7-407
semantics) — phases run in order, parameters reset between cycles, the final
redundant set reaches the target sparsity, and loss evidence feeds scores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.opt import HESSOCRIC, HESSOCRICConfig
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


def _run(params, opt, n_steps, loss=1.0):
    for step in range(n_steps):
        params = opt.step(params, _grads_like(params, seed=step), loss=loss)
    return params


def test_cric_full_cycle_reaches_target_sparsity():
    params, groups = _toy()
    cfg = HESSOCRICConfig(
        lr=1e-3, target_group_sparsity=0.5, start_cric_step=2,
        max_cycle_period=2, sampling_steps=3, hybrid_training_steps=3,
        proj_per_node_group=True)
    opt = HESSOCRIC(groups, params, cfg)

    # proj phase: 1 prunable group * 3 trial sparsities * 2 steps = 6 steps
    assert opt.start_global_sampling_step == 2 + 6

    params = _run(params, opt, 30)
    assert opt.is_terminated
    m = opt.compute_metrics(params)
    assert m["num_zero_groups"] == 4, m
    assert m["group_sparsity"] == pytest.approx(0.5)
    k = np.asarray(params["fc1"]["kernel"])
    assert (np.abs(k).sum(axis=0) == 0).sum() == 4
    # unprunable group untouched
    assert (np.abs(np.asarray(params["fc2"]["kernel"])).sum(axis=0) > 0).all()


def test_cric_resets_params_between_cycles():
    """During sampling, a cycle boundary restores the cached parameters
    (hesso_cric.py:165-167 reset_params)."""
    params, groups = _toy()
    cfg = HESSOCRICConfig(
        lr=0.0, target_group_sparsity=0.25, start_cric_step=1,
        max_cycle_period=5, sampling_steps=3, hybrid_training_steps=2,
        tolerance=-1,  # never early-terminate on empty violating set
        proj_per_node_group=False)
    opt = HESSOCRIC(groups, params, cfg)

    p0 = np.asarray(params["fc1"]["kernel"]).copy()
    p = params
    # step 1 = start_cric_step: cache + cycle 0 begins (violating set empty
    # at cycle 0 per reference: only cycle>=1 nominates from topk)
    hist = []
    for step in range(7):
        p = opt.step(p, _grads_like(p, scale=0.0), loss=1.0)
        hist.append(np.asarray(p["fc1"]["kernel"]).copy())
    # at each cycle boundary the params come back to the cache exactly
    boundary_states = [hist[3], hist[6]]  # steps 4 and 7 are k%3==0 resets
    for h in boundary_states:
        decayed = h[:, np.abs(h).sum(axis=0) > 0]
        ref = p0[:, np.abs(h).sum(axis=0) > 0]
        np.testing.assert_allclose(decayed, ref, rtol=1e-6)


def test_cric_violating_metrics_exposed():
    params, groups = _toy()
    cfg = HESSOCRICConfig(
        lr=1e-3, target_group_sparsity=0.5, start_cric_step=1,
        max_cycle_period=4, sampling_steps=3, hybrid_training_steps=2,
        tolerance=-1, proj_per_node_group=False)
    opt = HESSOCRIC(groups, params, cfg)
    # step 1 = start_cric_step: cycle 1 nominates the violating set from the
    # global bottom-K scores (hesso_cric.py:110-120)
    params = _run(params, opt, 2)
    m = opt.compute_metrics(params)
    assert m["num_violating_groups"] == 4  # 8 groups * 0.5 target
    assert "num_trial_violating_groups" in m
    params = _run(params, opt, 6)
    m = opt.compute_metrics(params)
    assert m["num_historical_violating_groups"] >= 4


def test_cric_loss_criterion_accumulates():
    """proj phase records loss/ref_loss per group; finalize adds it."""
    params, groups = _toy()
    cfg = HESSOCRICConfig(
        lr=1e-3, target_group_sparsity=0.5, start_cric_step=1,
        max_cycle_period=1, sampling_steps=2, hybrid_training_steps=2,
        proj_per_node_group=True)
    opt = HESSOCRIC(groups, params, cfg)
    params = _run(params, opt, 12, loss=2.0)
    assert opt.loss_collection["fc1"], "proj phase should record losses"
    # ref_loss was 2.0 at start; every recorded deviation is loss/ref/num_groups
    assert all(v == pytest.approx(2.0 / 2.0 / 8) for v in
               opt.loss_collection["fc1"])


def test_cric_proj_phase_restores_params_every_other_step():
    """proj: step a zeroes trial rows, step b resets from cache."""
    params, groups = _toy()
    cfg = HESSOCRICConfig(
        lr=0.0, target_group_sparsity=0.5, start_cric_step=1,
        max_cycle_period=3, sampling_steps=3, hybrid_training_steps=2,
        proj_per_node_group=True)
    opt = HESSOCRIC(groups, params, cfg)
    p0 = np.asarray(params["fc1"]["kernel"]).copy()
    # step 1 = start_cric_step: caches the incoming params AND runs the
    # first projection (reference falls through to proj_step at this step)
    p = opt.step(params, _grads_like(params, scale=0.0), loss=1.0)
    k = np.asarray(p["fc1"]["kernel"])
    assert (np.abs(k).sum(axis=0) == 0).sum() == 2  # 8 * 0.25 trial
    p = opt.step(p, _grads_like(p, scale=0.0), loss=1.0)  # record + reset
    np.testing.assert_allclose(np.asarray(p["fc1"]["kernel"]), p0, rtol=1e-6)
