"""Tests for the MTCNN cascade pipeline (detect/ vs code/mtcnn_detector.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.detect import (
    CascadeConfig,
    FaceModel,
    align_faces,
    detect_faces,
    init_cascade_params,
    pyramid_scales,
)
from alink_tpu.models.arcface import ArcFaceResNet100
from alink_tpu.ops.umeyama import arcface_template


class TestPyramid:
    def test_scale_recursion(self):
        """scales = 12/minsize * factor^i while short side * scale >= 12
        (mtcnn_detector.py:337-347)."""
        scales = pyramid_scales(120, 160, min_size=20, factor=0.709)
        assert scales[0] == pytest.approx(12 / 20)
        for a, b in zip(scales, scales[1:]):
            assert b == pytest.approx(a * 0.709)
        assert 120 * scales[-1] >= 12
        assert 120 * scales[-1] * 0.709 < 12

    def test_small_image_single_scale(self):
        scales = pyramid_scales(24, 24, min_size=20, factor=0.709)
        # 24 * 0.6 = 14.4 >= 12 but 14.4 * 0.709 = 10.2 < 12 -> one level.
        assert len(scales) == 1


@pytest.fixture(scope="module")
def cascade():
    return init_cascade_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def small_cfg():
    return CascadeConfig(
        thresholds=(0.0, 0.0, 0.0),  # random init -> accept ~everything
        stage1_scale_budget=32,
        stage1_budget=32,
        stage2_budget=16,
        stage3_budget=8,
    )


class TestCascade:
    def test_shapes_and_masks(self, cascade, small_cfg):
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 48, 3),
                                    jnp.float32, 0, 255)
        det = detect_faces(cascade, images, small_cfg)
        k = small_cfg.stage3_budget
        assert det.boxes.shape == (2, k, 4)
        assert det.scores.shape == (2, k)
        assert det.landmarks.shape == (2, k, 5, 2)
        assert det.valid.shape == (2, k)
        assert det.valid.dtype == jnp.bool_

    def test_high_threshold_rejects_all(self, cascade):
        cfg = CascadeConfig(thresholds=(1.1, 1.1, 1.1),
                            stage1_scale_budget=32, stage1_budget=32,
                            stage2_budget=16, stage3_budget=8)
        images = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 48, 3),
                                    jnp.float32, 0, 255)
        det = detect_faces(cascade, images, cfg)
        assert not bool(det.valid.any())

    def test_valid_boxes_are_sane(self, cascade, small_cfg):
        images = jax.random.uniform(jax.random.PRNGKey(3), (1, 48, 48, 3),
                                    jnp.float32, 0, 255)
        det = detect_faces(cascade, images, small_cfg)
        v = np.asarray(det.valid[0])
        if v.any():
            b = np.asarray(det.boxes[0])[v]
            # Stage-3 boxes are post-calibration (not squared, matching
            # mtcnn_detector.py:466); they must at least be finite and
            # their landmarks live within the pre-calibration square.
            assert np.isfinite(b).all()
            assert np.isfinite(np.asarray(det.landmarks[0])[v]).all()


class TestAlign:
    def test_template_landmarks_give_identity_warp(self):
        """A face whose landmarks already sit on the template must map to
        (approximately) itself."""
        template = np.asarray(arcface_template((112, 112)))
        img = jax.random.uniform(jax.random.PRNGKey(4), (1, 112, 112, 3),
                                 jnp.float32, 0, 255)
        lmk = jnp.asarray(template)[None, None]  # (1, 1, 5, 2)
        chips = align_faces(img, lmk, (112, 112))
        assert chips.shape == (1, 1, 112, 112, 3)
        # Interior pixels should be nearly unchanged.
        np.testing.assert_allclose(
            np.asarray(chips[0, 0, 20:90, 20:90]),
            np.asarray(img[0, 20:90, 20:90]),
            atol=1.0,
        )

    def test_shifted_landmarks_translate(self):
        """Landmarks shifted +10px right mean the chip samples 10px right."""
        template = np.asarray(arcface_template((112, 112)))
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (1, 112, 112, 3)).astype(np.float32)
        img = jnp.asarray(base)
        lmk = jnp.asarray(template + [10.0, 0.0])[None, None]
        chips = align_faces(img, lmk, (112, 112))
        np.testing.assert_allclose(
            np.asarray(chips[0, 0, 30:80, 30:80]),
            base[0, 30:80, 40:90],
            atol=1.0,
        )

    def test_warp_input_fence_is_semantics_neutral(self):
        """The optimization_barrier on the warp inputs (round-4 fence)
        must not change a single output bit — fence=False exists only
        for A/B measurement (benchmarks/exp_align_fence.py)."""
        template = np.asarray(arcface_template((112, 112)))
        img = jax.random.uniform(jax.random.PRNGKey(7), (2, 112, 112, 3),
                                 jnp.float32, 0, 255)
        lmk = jnp.asarray(template + [3.0, -2.0])[None, None].repeat(2, 0)
        fenced = align_faces(img, lmk, (112, 112), fence=True)
        bare = align_faces(img, lmk, (112, 112), fence=False)
        np.testing.assert_array_equal(np.asarray(fenced), np.asarray(bare))


class TestBenchGeometryInit:
    def test_landmark_head_seeded_at_mean_face_prior(self, cascade):
        """init_cascade_params seeds the O-Net landmark head at the MTCNN
        mean-face template with a tiny kernel (round 4): random-weight
        pipelines must exercise production alignment geometry, not the
        degenerate Umeyama fits ~N(0,1) landmarks produce."""
        from alink_tpu.detect.cascade import _MEAN_FACE

        head = cascade.onet["params"]["Dense_3"]
        np.testing.assert_allclose(np.asarray(head["bias"]),
                                   np.asarray(_MEAN_FACE), atol=1e-6)
        # Tiny kernel: landmark outputs stay near the prior.
        assert float(jnp.abs(head["kernel"]).max()) < 0.05
        # Mean-face x coordinates are symmetric-ish pairs inside the box.
        mf = np.asarray(_MEAN_FACE)
        assert ((0.0 < mf) & (mf < 1.0)).all()


class TestFaceModel:
    @pytest.fixture(scope="class")
    def tiny_embedder(self):
        model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
        params = model.init(jax.random.PRNGKey(5),
                            jnp.zeros((1, 112, 112, 3)))
        return model, params

    def test_passthrough_mode(self, tiny_embedder):
        """Detection-disabled path (face_model.py:71-84 live behaviour)."""
        model, params = tiny_embedder
        fm = FaceModel(params)
        fm.embedder = model
        images = jax.random.uniform(jax.random.PRNGKey(6), (3, 64, 64, 3),
                                    jnp.float32, 0, 255)
        feats = fm.process(images)
        assert feats.shape == (3, 512)
        norms = jnp.linalg.norm(feats, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)

    def test_full_pipeline(self, tiny_embedder, cascade, small_cfg):
        model, params = tiny_embedder
        fm = FaceModel(params, cascade, small_cfg)
        fm.embedder = model
        images = jax.random.uniform(jax.random.PRNGKey(7), (2, 48, 48, 3),
                                    jnp.float32, 0, 255)
        det = fm.detect(images)
        assert det.boxes.shape[0] == 2
        feats = fm.process(images)
        assert feats.shape == (2, 512)


    @pytest.mark.slow
    def test_no_face_images_are_flagged_and_zeroed(self, tiny_embedder,
                                                   cascade):
        """Batched analog of the reference get_input's None return
        (face_model.py:76): images with no valid detection yield
        found=False and a ZERO chip (never a garbage-landmark warp)."""
        import dataclasses

        from alink_tpu.detect import CascadeConfig

        model, params = tiny_embedder
        # Random weights vs threshold 0.99: nothing survives.
        cfg = CascadeConfig(thresholds=(0.99, 0.99, 0.99),
                            stage1_scale_budget=8, stage1_budget=8,
                            stage2_budget=4, stage3_budget=2)
        fm = FaceModel(params, cascade, cfg, embedder=model)
        images = jax.random.uniform(jax.random.PRNGKey(11), (2, 48, 48, 3),
                                    jnp.float32, 0, 255)
        chips, found = fm.get_input_valid(images)
        assert not bool(found.any())
        assert float(jnp.abs(chips).max()) == 0.0
        feats, found2 = fm.pipeline_valid(params, cascade, images)
        assert feats.shape == (2, 512)
        np.testing.assert_array_equal(np.asarray(found),
                                      np.asarray(found2))

    @pytest.mark.slow
    def test_cfg_swap_invalidates_cached_trace(self, tiny_embedder,
                                               cascade, small_cfg):
        """Reassigning cfg must re-trace process() — a cached trace would
        silently keep the old budgets/thresholds."""
        from alink_tpu.detect import CascadeConfig

        model, params = tiny_embedder
        fm = FaceModel(params, cascade, small_cfg, embedder=model)
        images = jax.random.uniform(jax.random.PRNGKey(12), (2, 48, 48, 3),
                                    jnp.float32, 0, 255)
        r1 = fm.process(images)
        fm.cfg = CascadeConfig(thresholds=(0.99, 0.99, 0.99),
                               stage1_scale_budget=8, stage1_budget=8,
                               stage2_budget=4, stage3_budget=2)
        r2 = fm.process(images)  # all-invalid -> zero chips -> differs
        assert bool(jnp.any(r1 != r2))


class TestLNetRefine:
    def test_accurate_landmark_path(self, cascade):
        from alink_tpu.detect import CascadeConfig, detect_faces

        cfg = CascadeConfig(
            thresholds=(0.0, 0.0, 0.0), stage1_scale_budget=32,
            stage1_budget=32, stage2_budget=16, stage3_budget=8,
            accurate_landmark=True,
        )
        images = jax.random.uniform(jax.random.PRNGKey(9), (1, 48, 48, 3),
                                    jnp.float32, 0, 255)
        det = detect_faces(cascade, images, cfg)
        assert det.landmarks.shape == (1, 8, 5, 2)
        assert bool(jnp.all(jnp.isfinite(det.landmarks)))

    def test_refine_moves_within_patch(self, cascade, small_cfg):
        """Refined landmarks stay within a patch width of the originals
        (the reference clamps large movements)."""
        from alink_tpu.detect import detect_faces
        import dataclasses

        images = jax.random.uniform(jax.random.PRNGKey(10), (1, 48, 48, 3),
                                    jnp.float32, 0, 255)
        base = detect_faces(cascade, images, small_cfg)
        refined = detect_faces(
            cascade, images,
            dataclasses.replace(small_cfg, accurate_landmark=True))
        v = np.asarray(base.valid[0])
        if v.any():
            b = np.asarray(base.boxes[0])[v]
            patch = np.maximum(b[:, 2] - b[:, 0] + 1, b[:, 3] - b[:, 1] + 1)
            patch = np.round(patch * 0.25) + 2
            delta = np.abs(np.asarray(refined.landmarks[0])[v]
                           - np.asarray(base.landmarks[0])[v])
            assert np.all(delta <= patch[:, None, None] + 1)


class TestDetectLimited:
    def test_limited_refines_given_boxes(self, cascade, small_cfg):
        from alink_tpu.detect import detect_faces_limited

        images = jax.random.uniform(jax.random.PRNGKey(11), (2, 48, 48, 3),
                                    jnp.float32, 0, 255)
        boxes = jnp.tile(jnp.array([[4.0, 4.0, 36.0, 40.0]]), (2, 4, 1))
        valid = jnp.ones((2, 4), bool)
        det = detect_faces_limited(cascade, images, boxes, valid, small_cfg)
        assert det.boxes.shape == (2, small_cfg.stage3_budget, 4)
        assert det.landmarks.shape == (2, small_cfg.stage3_budget, 5, 2)


class TestGenderAge:
    def test_decode_convention(self):
        from alink_tpu.models.genderage import GenderAgeHead, decode_ga

        out = np.zeros((1, 202), np.float32)
        out[0, 1] = 5.0  # gender = 1
        # age: make 30 of the 100 bins vote 1.
        for i in range(30):
            out[0, 2 + 2 * i + 1] = 5.0
        gender, age = decode_ga(jnp.asarray(out))
        assert int(gender[0]) == 1
        assert int(age[0]) == 30

        head = GenderAgeHead(dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
        y = head.apply(params, jnp.zeros((3, 512)))
        assert y.shape == (3, 202)
