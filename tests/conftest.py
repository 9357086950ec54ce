"""Test config: run everything on a virtual 8-device CPU mesh.

The TPU analog of a fake backend for multi-chip sharding tests
(SURVEY.md §4). Note: this image pre-imports jax via a sitecustomize on
PYTHONPATH, so setting JAX_PLATFORMS in os.environ here is too late —
``jax.config.update`` after import is the reliable override; the XLA flag
still works because the CPU backend has not been instantiated yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---- smoke tier (VERDICT r4 #8) ----------------------------------------
# One fast representative test per subsystem, markable centrally so the
# selection lives in ONE place. Inner loop:
#     python -m pytest tests/ -m smoke -q          (~3-4 min)
# Full non-slow pass (~32 min serial) parallelizes with pytest-xdist when
# available: python -m pytest tests/ -m "not slow" -n 4.
# test_smoke_tier.py asserts every nodeid below still exists.
SMOKE = {
    "test_fbank.py::test_num_frames",
    "test_fbank.py::test_logfbank_matches_psf_golden",
    "test_noise.py::test_snr_gain",
    "test_native_loader.py::test_probe_matches_python",
    "test_data.py::test_manifest_roundtrip",
    "test_models.py::test_dfcnn_shapes",
    "test_models.py::test_cached_greedy_matches_full_recompute",
    "test_ctc.py::test_ctc_loss_matches_golden_dp",
    "test_pallas_ctc.py::test_alpha_kernel_matches_scan_interpret",
    "test_pallas_beam.py::test_beam_kernel_matches_scan_peaked",
    "test_pallas_fbank.py::test_pallas_matches_xla_batched",
    "test_topk_kernel.py::test_random_beam_shape",
    "test_matfft.py::test_ifft_matmul_matches_numpy",
    "test_attn_kernel.py::test_forward_matches_einsum",
    "test_train.py::test_polynomial_decay_with_cycle_matches_tf_semantics",
    "test_checkpoint_rotation.py::test_save_best_overwrites_and_cleans",
    "test_identity.py::test_diff_classifies_structural_vs_advisory",
    "test_pipeline.py::test_pipeline_recognize_batch",
    "test_streaming.py::test_incremental_equals_offline_with_global_stats",
    "test_serving.py::test_server_matches_direct_path",
    "test_http_server.py::test_http_recognize_matches_direct",
    "test_stream_sessions.py::test_partial_progresses_and_want_partial_none",
    "test_export_serving.py::test_export_meta_and_roundtrip_exact",
    "test_sharding.py::test_make_mesh_shapes",
    "test_tb_events.py::test_crc32c_known_answers",
    "test_phoneme.py::test_split_pinyin",
    "test_vocab.py::test_acoustic_vocab_size_and_blank_last",
    "test_tf_ckpt.py::test_crc32c_known_vectors",
    "test_hdf5_import.py::test_hdf5_import_runs_forward",
    "test_factory.py::test_default_config_matches_reference_hparams",
    "test_bench_helpers.py::test_roofline_verdicts",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # originalname strips parametrize ids ("test_x[5-50-64]" -> the
        # whole parameter grid of a listed test joins the tier)
        base = getattr(item, "originalname", None) or item.name
        key = f"{os.path.basename(str(item.fspath))}::{base}"
        if key in SMOKE:
            item.add_marker(pytest.mark.smoke)
