"""Elastic recovery: failure -> shrink mesh -> sharded restore -> resume.

VERDICT r2 #7: round 2 had a health check but no recovery path. These
tests run the full loop on the 8-device virtual mesh: a training step runs
sharded, a checkpoint is written (orbax shards), a HealthCheckError is
injected (standing in for the watchdog timing out a wedged collective — a
real dead rank cannot be created inside one process), and the supervisor
restores onto a 4-device mesh and resumes the step loop.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_vit_tpu.parallel import collective_health_check
from quantized_vit_tpu.parallel.distributed import HealthCheckError
from quantized_vit_tpu.parallel.elastic import (elastic_restore,
                                                run_with_elastic_recovery,
                                                shrink_mesh)
from quantized_vit_tpu.parallel.sharded_ckpt import save_sharded_checkpoint

pytestmark = pytest.mark.slow  # orbax writes + multiple mesh compiles


RULES = [(r"kernel$", P(None, "model")), (r"", P())]


def _mesh(dp, tp):
    return Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                axis_names=("data", "model"))


def _params(rng):
    return {
        "dense": {"kernel": jnp.array(rng.standard_normal((16, 32)),
                                      jnp.float32),
                  "bias": jnp.array(rng.standard_normal(32), jnp.float32)},
    }


def test_shrink_mesh_keeps_tp_when_divisible():
    m = shrink_mesh(jax.devices()[:6], model_parallel=2)
    assert m.devices.size == 4 and m.shape["model"] == 2
    m2 = shrink_mesh(jax.devices()[:2], model_parallel=4)
    # TP=4 impossible with 2 devices -> folds into data
    assert m2.shape["model"] == 1 and m2.devices.size == 2


def test_elastic_restore_onto_shrunken_mesh(tmp_path):
    rng = np.random.default_rng(0)
    params = _params(rng)
    mesh8 = _mesh(4, 2)
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh8, P())), params)
    ckpt = str(tmp_path / "ckpt")
    save_sharded_checkpoint(ckpt, sharded, extra={"step": 3})

    restored, extra, mesh4 = elastic_restore(
        ckpt, jax.devices()[:4], model_parallel=2, rules=RULES,
        health_timeout_s=120)
    assert extra["step"] == 3
    assert mesh4.devices.size == 4 and mesh4.shape["model"] == 2
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored, params)
    # the restored kernel actually lives sharded per the rules
    k = restored["dense"]["kernel"]
    assert k.sharding.spec == P(None, "model"), k.sharding


def test_supervisor_recovers_and_resumes(tmp_path):
    """Step loop hits an injected failure mid-run; the supervisor restores
    from the checkpoint onto fewer devices and finishes the remaining
    steps there. Every post-recovery step runs on the shrunken mesh."""
    rng = np.random.default_rng(1)
    params = _params(rng)
    mesh8 = _mesh(4, 2)
    params = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh8, P())), params)
    ckpt = str(tmp_path / "ckpt")
    save_sharded_checkpoint(ckpt, params, extra={"step": 1})

    seen = []

    def step_fn(p, mesh, step):
        seen.append((step, mesh.devices.size))
        x = jax.device_put(jnp.ones((8, 16), jnp.float32),
                           NamedSharding(mesh, P("data")))
        y = x @ p["dense"]["kernel"] + p["dense"]["bias"]
        assert bool(jnp.all(jnp.isfinite(y)))
        return p

    calls = {"n": 0}

    def flaky_health(mesh):
        calls["n"] += 1
        if calls["n"] == 3:  # watchdog fires before step 2's work
            raise HealthCheckError("injected: rank lost (watchdog)")
        return collective_health_check(mesh, timeout_s=120)

    params, mesh, failures = run_with_elastic_recovery(
        step_fn, params, mesh8, ckpt, steps=4, health_fn=flaky_health,
        surviving_devices_fn=lambda: jax.devices()[:4],
        model_parallel=2, rules=RULES, max_failures=1)

    assert failures == 1
    assert mesh.devices.size == 4
    # resumed from the checkpoint's step (1) on the 4-device mesh and
    # completed through step 3
    post = [s for s in seen if s[1] == 4]
    assert [s[0] for s in post] == [1, 2, 3], seen
    # unrecoverable: a second failure beyond max_failures re-raises
    calls["n"] = 0

    def always_fail(mesh):
        raise HealthCheckError("injected")

    with pytest.raises(HealthCheckError):
        run_with_elastic_recovery(
            step_fn, params, mesh, ckpt, steps=2, health_fn=always_fail,
            surviving_devices_fn=lambda: jax.devices()[:4],
            model_parallel=2, rules=RULES, max_failures=0)
