"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on this fake mesh (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before any `import jax` in the test session, hence top of conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The JAX_PLATFORMS env var is ignored in this environment (a TPU plugin
# claims the backend regardless); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
# x64 support so parity tests can compare against torch float64 oracles
# without float32 ulp knife-edges; float32 tests still pass f32 arrays.
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


# --- test tiers (VERDICT r1 #9) -------------------------------------------
# Everything in _SLOW (measured >=4s on the 2-CPU box, --durations=40) is
# marked `slow`; the rest is marked `smoke`. `-m smoke` is the <2 min sanity
# tier; the full suite runs both. Entries are "file::test" (test name
# without the param bracket) or "file" for a whole module.
_SLOW = {
    "test_cli_drivers.py",              # train->eval->predict->export e2e
    "test_accuracy_e2e.py",             # trains to convergence
    "test_mobilenet.py::test_hesso_prunes_mobilenet_to_target",
    "test_mobilenet.py::test_zero_groups_then_compress_is_lossless",
    "test_mobilenet.py::test_node_groups_merge_depthwise_into_producer",
    "test_partition.py::test_dryrun_multichip_entrypoint",
    "test_transformer.py::test_geta_step_and_costs",
    "test_transformer.py::test_quantized_matches_fp32_at_high_bits",
    "test_transformer.py::test_subnet_construction_head_and_hidden_pruning",
    "test_transformer.py::test_oto_on_compressed_model_regroups_correctly",
    "test_pipeline.py",
    "test_geta.py::test_checkpoint_roundtrip",
    "test_geta.py::test_projection_rampdown",
    "test_geta.py::test_subnet_construction_matches_sparse_forward",
    "test_geta.py::test_range_projection_bounds_hold",
    "test_resnet.py::test_resnet_geta_trains_and_prunes",
    "test_resnet.py::test_resnet_zero_groups_then_compress_is_lossless",
    "test_autogroups.py::test_discovered_groups_drive_hesso",
    "test_autogroups.py::test_oto_facade_auto_discovery_on_custom_model",
    "test_autogroups.py::test_quantized_model_discovery_sees_through_fake_quant",
    "test_autogroups.py::test_vit_discovery_is_conservative",
    "test_model_artifacts.py::test_vit_int4_artifact_roundtrip_forward_parity",
    "test_subnet.py",
    "test_autoencoder_subnet.py",
    "test_auto_subnet.py",
    "test_sharded_ckpt.py::test_roundtrip_same_mesh",
    "test_data_training.py::test_trainloop_reduces_loss_and_preserves_finiteness",
    "test_data_training.py::test_trainloop_with_mixup_kd_and_lasso_runs",
    "test_oto_extras.py::test_random_zero_then_construct_subnet_roundtrip",
    "test_model_converter.py::test_converted_vit_structure_and_parity",
    "test_hls.py::test_export_ultranet_hls_end_to_end",
    "test_vit_int4.py::test_int_forward_pallas_interpret_matches_xla",
    "test_hesso_cric.py",
    "test_geta.py::test_target_sparsity_reached",
    "test_model_artifacts.py::test_vit_int4_artifact_sharded_load",
    "test_hls.py::test_export_ultranet_hls_handles_pruned_channels",
    "test_mobilenet.py::test_cost_report_counts_depthwise_cheaply",
    "test_transformer.py::test_gqa_prune_compress_is_lossless",
    "test_data_training.py::test_nonfinite_loss_raises",
    "test_logging.py::test_metrics_writer_tensorboard_events",
    "test_sharded_ckpt.py::test_restore_onto_different_topology",
    "test_model_converter.py::test_converted_resnet_matches_fp32_at_high_bits",
    "test_autogroups.py::test_mobilenet_discovery_matches_declarative_incl_depthwise_merge",
    "test_ultranet_parity.py::test_ultranet_train_mode_matches_reference",
    "test_builders_costs.py::test_ultranet_cost_report_counts_all_convs",
    "test_ultranet_parity.py::test_ultranet_eval_matches_reference",
    "test_resnet.py::test_resnet_cost_report_decreases_after_compression",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        test = item.name.split("[")[0]
        if fname in _SLOW or f"{fname}::{test}" in _SLOW:
            item.add_marker(pytest.mark.slow)
        elif not any(m.name == "slow" for m in item.iter_markers()):
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))
