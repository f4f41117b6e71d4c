"""Multi-host runtime checks on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from quantized_vit_tpu.parallel import (
    HealthCheckError,
    assert_same_step,
    collective_health_check,
    create_hybrid_mesh,
    initialize_distributed,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs the 8-device CPU mesh")


def test_initialize_distributed_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


@needs_8
def test_hybrid_mesh_single_slice_shapes():
    mesh = create_hybrid_mesh(ici_shape=(4, 2), dcn_shape=(1,),
                              axis_names=("replica", "data", "model"))
    assert mesh.devices.shape == (1, 4, 2)
    assert mesh.axis_names == ("replica", "data", "model")


def test_hybrid_mesh_rejects_bad_axis_names():
    with pytest.raises(ValueError):
        create_hybrid_mesh(ici_shape=(2, 2), dcn_shape=(1,),
                           axis_names=("data", "model"))


@needs_8
def test_collective_health_check_passes():
    mesh = create_hybrid_mesh(ici_shape=(4, 2), dcn_shape=(1,),
                              axis_names=("replica", "data", "model"))
    report = collective_health_check(mesh, timeout_s=120.0)
    assert report.ok
    assert report.num_devices == 8
    assert report.latency_s < 120.0


@needs_8
def test_health_check_watchdog_trips_on_hang(monkeypatch):
    mesh = create_hybrid_mesh(ici_shape=(8,), dcn_shape=(1,),
                              axis_names=("replica", "data"))
    import quantized_vit_tpu.parallel.distributed as dist

    def hang(*a, **k):
        import time
        time.sleep(5.0)

    monkeypatch.setattr(dist.jax, "device_put", hang)
    with pytest.raises(HealthCheckError, match="hung"):
        collective_health_check(mesh, timeout_s=0.5)


@needs_8
def test_assert_same_step_passes_on_agreement():
    mesh = create_hybrid_mesh(ici_shape=(8,), dcn_shape=(1,),
                              axis_names=("replica", "data"))
    assert_same_step(42, mesh)  # single process: trivially consistent
