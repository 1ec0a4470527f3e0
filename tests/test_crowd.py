"""Oracle tests for the crowd profile's aggregate cross-image budgets.

The ``CascadeConfig.crowd()`` profile pools stage-2/3 candidate budgets
across the batch (detect/cascade.py:_detect_faces_crowd) — LOSSY BY
CONTRACT when the batch's candidate mass exceeds the pooled budget.
These tests pin the contract:

1. Within budget (pooled totals >= every candidate the lossless path
   would process), the crowd path returns EXACTLY the lossless path's
   detections — the pooling is pure plumbing then.
2. Over budget, the dropped candidates are the globally LOWEST-scoring
   ones: every top-score candidate survives pooling.
3. The scatter assigns per-image slots in score order with a cap, and
   images with no candidates stay empty.

Reference bar: the reference's per-image Python loop
(mtcnn_detector.py:401-470) has no batch dimension; the aggregate
budget is a greenfield throughput profile for crowd workloads.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.detect.cascade import (CascadeConfig, _pool_by_score,
                                      _scatter_per_image, detect_faces,
                                      init_cascade_params)


@pytest.fixture(scope="module")
def cascade():
    return init_cascade_params(jax.random.PRNGKey(0), with_lnet=False)


def _images(n=3, size=48, seed=1):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, size, size, 3),
                              jnp.float32, 0, 255)


class TestPoolScatter:
    def test_pool_orders_by_image_then_score(self):
        scores = jnp.array([0.9, 0.1, 0.5, 0.8, 0.3, 0.7]).reshape(2, 3)
        valid = jnp.ones((2, 3), bool)
        idx, iid, tv = _pool_by_score(scores.reshape(-1),
                                      valid.reshape(-1), 2, 3, 5)
        # Top-5 drops the global minimum (0.1 at flat idx 1).
        assert 1 not in np.asarray(idx)[np.asarray(tv)].tolist()
        iid_np = np.asarray(iid)
        assert (np.diff(iid_np) >= 0).all()  # grouped by image
        # Within an image, scores descend.
        s = np.asarray(scores.reshape(-1))[np.asarray(idx)]
        for i in range(2):
            si = s[iid_np == i]
            assert (np.diff(si) <= 0).all()

    def test_pool_invalid_sorts_last(self):
        scores = jnp.array([0.9, 0.8, 0.7, 0.6])
        valid = jnp.array([True, False, True, False])
        idx, iid, tv = _pool_by_score(scores, valid, 2, 2, 4)
        assert int(np.asarray(tv).sum()) == 2
        assert not np.asarray(tv)[2:].any()  # invalid grouped at the end

    def test_scatter_caps_and_ranks(self):
        # 4 candidates of image 0 (scores desc), 1 of image 1; cap 2.
        img_id = jnp.array([0, 0, 0, 0, 1])
        tvalid = jnp.array([True, True, False, True, True])
        vals = jnp.array([10.0, 9.0, 8.0, 7.0, 5.0])
        (out,), vmask = _scatter_per_image(img_id, tvalid, 2, 2, vals)
        # Image 0 keeps its two best VALID candidates (10, 9) — the dead
        # candidate 8 must not burn a slot; 7 overflows the cap.
        np.testing.assert_allclose(np.asarray(out[0]), [10.0, 9.0])
        np.testing.assert_allclose(np.asarray(out[1]), [5.0, 0.0])
        np.testing.assert_array_equal(np.asarray(vmask),
                                      [[True, True], [True, False]])

    def test_scatter_empty_image(self):
        img_id = jnp.array([1, 1])
        tvalid = jnp.array([True, True])
        vals = jnp.array([3.0, 2.0])
        (out,), vmask = _scatter_per_image(img_id, tvalid, 3, 2, vals)
        assert not np.asarray(vmask[0]).any()
        assert not np.asarray(vmask[2]).any()
        np.testing.assert_allclose(np.asarray(out[1]), [3.0, 2.0])


class TestCrowdOracle:
    def test_within_budget_matches_lossless(self, cascade):
        """Pooled totals >= n*k at every stage -> identical detections."""
        images = _images(n=3)
        base = CascadeConfig(thresholds=(0.0, 0.0, 0.0),
                             stage1_scale_budget=16, stage1_budget=16,
                             stage2_budget=8, stage3_budget=4)
        crowd = dataclasses.replace(base, stage2_total=3 * 16,
                                    stage3_total=3 * 8)
        want = detect_faces(cascade, images, base)
        got = detect_faces(cascade, images, crowd)
        np.testing.assert_array_equal(np.asarray(want.valid),
                                      np.asarray(got.valid))
        np.testing.assert_allclose(np.asarray(want.scores),
                                   np.asarray(got.scores), atol=1e-5)
        v = np.asarray(want.valid)
        np.testing.assert_allclose(np.asarray(want.boxes)[v],
                                   np.asarray(got.boxes)[v], atol=1e-3)
        np.testing.assert_allclose(np.asarray(want.landmarks)[v],
                                   np.asarray(got.landmarks)[v], atol=1e-3)

    def test_over_budget_keeps_top_scores(self, cascade):
        """Halving the stage-2 pool must drop only the LOWEST stage-1
        scores: every pooled survivor's stage-1 score >= the best
        dropped one."""
        images = _images(n=4, seed=3)
        base = CascadeConfig(thresholds=(0.0, 0.0, 0.0),
                             stage1_scale_budget=16, stage1_budget=16,
                             stage2_budget=8, stage3_budget=4)
        from alink_tpu.detect.cascade import _stage1

        h, w = images.shape[1], images.shape[2]
        b1, s1, v1 = jax.vmap(
            lambda im: _stage1(cascade, im, base, h, w))(images)
        total = int(np.asarray(v1).sum())
        assert total > 8, "fixture must overflow the pooled budget"
        t2 = max(2, total // 2)
        idx, iid, tv = _pool_by_score(s1.reshape(-1), v1.reshape(-1),
                                      4, 16, t2)
        s_flat = np.asarray(s1.reshape(-1))
        v_flat = np.asarray(v1.reshape(-1))
        kept = np.asarray(idx)[np.asarray(tv)]
        dropped = np.setdiff1d(np.where(v_flat)[0], kept)
        assert s_flat[kept].min() >= s_flat[dropped].max() - 1e-6

    def test_crowd_profile_runs_end_to_end(self, cascade):
        """The shipped crowd() defaults produce well-formed Detections."""
        images = _images(n=2, size=64, seed=4)
        cfg = CascadeConfig.crowd(thresholds=(0.0, 0.0, 0.0),
                                  stage1_scale_budget=16, stage1_budget=16,
                                  stage2_budget=8, stage3_budget=4,
                                  stage2_total=24, stage3_total=12)
        det = detect_faces(cascade, images, cfg)
        assert det.boxes.shape == (2, 4, 4)
        assert det.valid.dtype == jnp.bool_
        assert bool(jnp.all(jnp.isfinite(det.landmarks)))
