"""Test config: run everything on a virtual 8-device CPU mesh.

In some environments (axon TPU tunnel) jax is pre-imported at interpreter
startup and its platform list is force-set, so env vars alone are not
enough; the CPU client is created lazily, so overriding the platform and
XLA_FLAGS here (before any computation) still works.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads share the host cores; on few-core hosts XLA:CPU's
# default 40 s rendezvous terminate timeout ABORTS mesh tests that are merely
# serially staggered. Give collectives a generous budget instead.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------- slow tier
# Central slow-test registry: every test that took > 20 s per call on the
# 1-core CI host (full-suite --durations=0 run, round 4; contended ~1.5x).
# scripts/run_tests.sh deselects these by default (-m "not slow"); --full
# runs everything. Keep node ids parametrization-free (matched by prefix).
_SLOW = {
    # round-5 additions (153 s / 117 s on the 1-core host)
    "tests/test_train_steps.py::TestExtensionStep::test_translation_floor_gate_masks_attractor_labels",
    "tests/test_parallel.py::TestLabelerLocalBN::test_dp_local_bn_divergence_is_bounded",
    "tests/test_api.py::TestExtractFeatures::test_determinism_and_shape_bucketing",
    "tests/test_api.py::TestExtractFeatures::test_occupancy_default",
    "tests/test_api.py::TestExtractFeatures::test_rgb_normal_channels",
    "tests/test_benchmarks.py::TestGtLog::test_scene_protocol_end_to_end",
    "tests/test_benchmarks.py::TestHarness::test_registers_synthetic_pairs",
    "tests/test_benchmarks.py::TestHarness::test_use_icp_changes_pose",
    "tests/test_import_torch.py::TestGoldenFeatures::test_imported_matches_golden",
    "tests/test_import_torch.py::TestGoldenFeaturesFlagship::test_imported_matches_golden",
    "tests/test_import_torch.py::TestRoundTrip::test_resunet_block_mapping",
    "tests/test_iter_size.py::TestRealStepIterSize::test_base_step_iter2_runs",
    "tests/test_models.py::TestForward::test_eval_mode_batch_isolation",
    "tests/test_models.py::TestForward::test_folded_bn_matches_unfolded",
    "tests/test_models.py::TestForward::test_instance_norm_per_cloud",
    "tests/test_models.py::TestForward::test_shapes_masking_and_norm",
    "tests/test_models.py::TestForward::test_translation_equivariance",
    "tests/test_models.py::TestRegistry::test_all_registered_initialize",
    "tests/test_parallel.py::TestEvalDP::test_dp4_eval_equals_serial",
    "tests/test_parallel.py::TestSyncBN::test_dp_forward_equals_global_forward",
    "tests/test_parallel.py::TestTrainerDP::test_trainer_runs_dp_epoch",
    "tests/test_record_similarity.py::TestRecordStepEndToEnd::test_synthetic_pair",
    "tests/test_runbook.py::test_runbook_import_then_eval",
    "tests/test_sparse.py::TestBricks::test_level_sets_match_oracle",
    "tests/test_sparse.py::TestBricks::test_multicloud_segments_isolated",
    "tests/test_sparse.py::TestBricks::test_nbr6",
    "tests/test_sparse.py::TestConvOracles::test_bf16_smoke",
    "tests/test_sparse.py::TestConvOracles::test_conv_down",
    "tests/test_sparse.py::TestConvOracles::test_conv_same",
    "tests/test_sparse.py::TestConvOracles::test_conv_up",
    "tests/test_sparse.py::TestConvOracles::test_gap_semantics",
    "tests/test_train_steps.py::TestBaseStep::test_base_step_decreases_loss",
    "tests/test_train_steps.py::TestBaseStep::test_gt_label_mode",
    "tests/test_train_steps.py::TestEvalSteps::test_downsample_single_affects_results",
    "tests/test_train_steps.py::TestEvalSteps::test_test_step_ransac",
    "tests/test_train_steps.py::TestEvalSteps::test_test_step_sc2",
    "tests/test_train_steps.py::TestEvalSteps::test_valid_step",
    "tests/test_train_steps.py::TestExtensionStep::test_extension_step_no_sc2",
    "tests/test_train_steps.py::TestExtensionStep::test_extension_step_runs",
    "tests/test_trainer_e2e.py::test_eyoc_trainer_base_to_extension",
    "tests/test_trainer_e2e.py::test_hardest_contrastive_trainer_runs",
    "tests/test_trainer_e2e.py::test_resume_roundtrip",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.nodeid.split("[")[0]
        if base in _SLOW:
            item.add_marker(_pytest.mark.slow)
