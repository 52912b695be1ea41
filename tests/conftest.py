"""Test bootstrap: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count=8``); the axon sitecustomize forces
``jax_platforms=axon,cpu`` at interpreter start, so we override via
``jax.config`` (env vars alone are ignored once register() has run).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


# ---- test tiers ------------------------------------------------------
# Smoke tier:  python -m pytest tests/ -q -m "not slow and not multiprocess"
# Full suite:  drop the -m filter (~24 min on this single-core host).
# Every test function below measured >=4.7 s in a full --durations run on
# the reference host (single core, virtual 8-device CPU mesh); marking them
# ``slow`` keeps the smoke tier ~3 min so it actually gets run on every
# change. Names not found at collection time raise, so the list cannot go
# silently stale after a rename.
SLOW_TESTS = {
    "test_atlas_io.py": {"test_import_atlas_retriever_towers"},
    "test_bench_guard.py": {
        "test_wedged_relay_without_sidecar_falls_back_to_cpu",
        "test_wedged_relay_emits_stale_sidecar",
    },
    "test_cli.py": {
        "test_train_then_evaluate_cli",
        "test_train_cli_hybrid_index",
    },
    "test_encoder.py": {
        "test_hf_parity",
        "test_retriever_untied_and_freeze",
        "test_embed_build_search_end_to_end",
        "test_build_index_length_bucketing",
        "test_mask_invariance",
    },
    "test_evaluation.py": {
        "test_evaluate_produces_metrics_and_predictions",
        "test_evaluate_closed_book",
        "test_evaluate_with_beam_search",
    },
    "test_flat_index.py": {
        "test_hybrid_storage_through_shards",
        "test_transposed_pad_starved_shard_keeps_topk",
        "test_hybrid_save_load_roundtrip",
    },
    "test_int8r.py": {
        "test_int8r_storage_through_shards",
        "test_int8r_save_load_roundtrip",
        "test_int8r_kernel_matches_reconstruction_oracle",
        "test_int8r_incremental_refresh",
    },
    "test_ivf.py": {
        "test_ivf_pq_recall_and_memory",
        "test_ivf_pq_refine_beats_plain",
    },
    "test_large_geometry.py": {
        "test_dim1024_index_train_eval_cycle",
        "test_bge_large_geometry_hf_parity",
        "test_gqa_8_kv_heads_parity_and_generate",
    },
    "test_lm.py": {
        "test_greedy_generate_matches_no_cache",
        "test_lora_zero_is_identity_and_grads_flow",
        "test_beam_forced_prefix",
        "test_remat_same_values_and_grads",
        "test_beam_generate_matches_hf",
        "test_greedy_early_exit_budget_invariance",
        "test_beam_early_exit_budget_invariance",
        "test_greedy_min_new_tokens",
        "test_greedy_logprobs_match_rescoring",
        "test_gpt2_parity_and_generate",
    },
    "test_mips.py": {
        "test_f16_refine_no_duplicate_ids_when_pool_exceeds_valid",
        "test_pallas2_f16_refine_matches_f32_oracle",
        "test_pallas2_int8_transposed_exact_and_hybrid",
        "test_flat_index_f16_refine_through_shards",
        "test_transposed_pad_rows_masked",
        "test_transposed_valid_n_masks_tail",
        "test_transposed_matches_oracle",
    },
    "test_modes.py": {
        "test_jsa_with_int8_index",
        "test_jsa_variants",
        "test_contrastive_training_sample_num_negatives",
        "test_mode_losses_and_grad_routing",
        "test_dropout_train_stochastic_eval_deterministic",
        "test_simplify_jsa_without_posterior_params",
        "test_build_batch_file_passages",
        "test_use_file_union_width_parity",
        "test_jsa_decoupled_shared_tower_grads",
        "test_unil_postandprior_off_uses_posterior_topk",
        "test_generate_beam_path",
    },
    "test_train_step.py": {
        "test_pipeline_retrieval_matches_sync_when_frozen",
        "test_sharded_step_matches_single_device",
        "test_accumulation_steps_with_production_step",
        "test_train_loop_runs_sharded",
        "test_batch_sharded_and_params_keep_placement",
        "test_evaluate_with_sharded_params",
    },
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    seen: dict[str, set] = {}
    for item in items:
        fname = os.path.basename(str(item.fspath))
        names = SLOW_TESTS.get(fname)
        if names and getattr(item, "originalname", item.name) in names:
            item.add_marker(slow)
            seen.setdefault(fname, set()).add(
                getattr(item, "originalname", item.name))
    # a renamed/removed test must be dropped from the list explicitly —
    # but only enforce on full-file collections (running a single test by
    # node id or -k legitimately collects a subset)
    partial = (any("::" in a for a in config.args)
               or bool(getattr(config.option, "keyword", "")))
    if partial:
        return
    collected = {os.path.basename(str(i.fspath)) for i in items}
    for fname, names in SLOW_TESTS.items():
        missing = names - seen.get(fname, set())
        if missing and fname in collected:
            raise pytest.UsageError(
                f"conftest SLOW_TESTS lists unknown tests in {fname}: "
                f"{sorted(missing)} — update the list after the rename")


@pytest.fixture(scope="session")
def mesh8():
    from jsa_rag_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=2, n_index=4)


@pytest.fixture(scope="session")
def mesh_flat():
    from jsa_rag_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=1, n_index=8)
