"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md section 4).  This suite uses
the standard JAX fake backend for TPU-mesh code: force the CPU platform and
split it into 8 virtual devices so every sharding/collective path is
exercised without TPU hardware.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU plugin), so ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars are
read before conftest runs.  ``jax.config.update`` still works because no
backend has been initialised yet.
"""

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Full-suite memory-map headroom: one pytest process compiles several
# hundred XLA CPU executables, and the process's memory-map count grows
# past the default vm.max_map_count (65530) about two thirds through the
# suite — at which point an mmap inside XLA's compiler fails and the
# process segfaults (reproduced deterministically at the same test,
# cache on or off; every file-level subset passes because it stays
# under the ceiling; /proc/<pid>/maps sampling showed the climb).
# Raise the ceiling when we can (root container); harmless no-op
# otherwise — non-root boxes should `sysctl -w vm.max_map_count=262144`
# or shard the suite across processes (pytest-xdist).
def _ensure_map_headroom(target: int = 262144) -> None:
    # NOTE: this is a system-wide, persistent sysctl change (root only).
    # It is required for the full one-process suite, so it stays on by
    # default, but it announces itself and honours an opt-out for hosts
    # where mutating kernel knobs from a test run is unacceptable.
    import os
    import sys

    if os.environ.get("ALINK_TEST_NO_SYSCTL"):
        return
    knob = pathlib.Path("/proc/sys/vm/max_map_count")
    try:
        current = int(knob.read_text())
        if current < target:
            knob.write_text(str(target))
            print(
                f"[conftest] raised vm.max_map_count {current} -> {target} "
                "(system-wide, persists until reboot; set "
                "ALINK_TEST_NO_SYSCTL=1 to forbid)",
                file=sys.stderr,
            )
    except (OSError, ValueError):
        pass


_ensure_map_headroom()
# bfloat16 matmuls on CPU are emulated and slow; tests use float32 precision.
jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: the suite's wall clock is dominated by XLA
# compiles on this box's single CPU core (30+ min cold); cached repeats
# of unchanged programs roughly halve it.  Keyed by HLO hash, so code
# changes recompile exactly what changed.  ALINK_TEST_NO_COMPILE_CACHE=1
# disables it (debugging aid for cache-interaction suspects).
import os

if not os.environ.get("ALINK_TEST_NO_COMPILE_CACHE"):
    _cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_test_cache"
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Smoke tier (VERDICT r4 #7): one cheap path through every layer, curated
# HERE rather than with file-level marks (a file mark would drag that
# file's slow tests in).  Run with  `python -m pytest tests/ -q -m smoke`.
# Keep this list <2 min warm on the single-core reference box — measure
# after edits and trim; the measured number is recorded in pytest.ini.
_SMOKE = {
    # ops: NMS / boxes / crop / warp / umeyama
    "test_nms_matches_greedy_reference",
    "test_nms_tie_break_consistent_across_paths",
    "test_crop_and_resize_exact_box",
    "test_affine_warp_pallas_matches_gather_oracle",
    # cascade + bf16 numeric path + crowd pooling
    "test_shapes_and_masks",
    "test_template_landmarks_give_identity_warp",
    "test_bf16_cascade_matches_f32_within_budget",
    "test_crop_offset_scale_fold_matches_post_preprocess",
    "test_bf16_fold_beats_unfolded_quantisation",
    "test_pool_orders_by_image_then_score",
    "test_scatter_caps_and_ranks",
    "test_crowd_profile_runs_end_to_end",
    # models / preprocess
    "test_siamese_head_softmax_shapes",
    "test_arcface_embeddings_unit_norm",
    "test_pnet_output_grid_stride2_cell12",
    "test_preprocess_mtcnn",
    # active loop: committee, selection, query flow
    "test_predict_is_member_mean",
    "test_disparity_topk",
    "test_select_queries_end_to_end",
    # noise + attack + DE
    "test_gaussian_statistics",
    "test_registry_parity",
    "test_perturb_image_semantics",
    "test_sphere_converges",
    # data layer
    "test_dfw_protocol",
    "test_all_pairs_minibatch_counts",
    # pairwise scorer + serving
    "test_xla_matches_direct_apply",
    "test_verify_pairs_shapes_and_range",
    # evaluation chain
    "test_matches_reference_loop",
    "test_roc_from_scores_chain",
    # training
    "test_bce_matches_keras_formula",
    "test_train_step_reduces_loss",
    # parallel / sharding (virtual mesh)
    "test_shard_batch_pads",
    "test_sharded_featurize_matches_local",
    # converters + utils
    "test_stage_size_inference_covers_the_zoo",
    "test_one_hot",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        if name in _SMOKE and not item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def mesh8():
    from alink_tpu.parallel import create_mesh

    return create_mesh((4, 2))


@pytest.fixture(scope="session")
def mesh_data():
    from alink_tpu.parallel import create_mesh

    return create_mesh((-1,))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
