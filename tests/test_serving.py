"""Tests for the serving API (serving.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.models import SiameseHead
from alink_tpu.serving import Verifier

D = 48


@pytest.fixture(scope="module")
def verifier():
    head = SiameseHead(widths=(16, 8), dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, D)),
                       jnp.zeros((1, D)))

    def featurize(images):
        return images.reshape(images.shape[0], -1)[:, :D]

    return Verifier(featurize, params)


def _faces(seed, n):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n, 4, 4, 3)).astype(np.float32)


class TestVerify:
    def test_verify_pairs_shapes_and_range(self, verifier):
        a, b = _faces(0, 5), _faces(1, 5)
        p = verifier.verify_pairs(a, b)
        assert p.shape == (5,)
        assert bool(jnp.all((p >= 0) & (p <= 1)))

    def test_identical_pairs_score_consistently(self, verifier):
        a = _faces(2, 3)
        p1 = verifier.verify_pairs(a, a)
        p2 = verifier.verify_pairs(a, a)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


class TestGallery:
    def test_enroll_and_identify(self, verifier):
        gallery = _faces(3, 4)
        verifier.enroll(gallery, ["ann", "bo", "cy", "di"])
        assert verifier.gallery_size == 4
        labels, scores = verifier.identify(gallery, k=2)
        assert len(labels) == 4 and len(labels[0]) == 2
        assert scores.shape == (4, 2)
        # Scores are sorted descending per probe.
        assert np.all(scores[:, 0] >= scores[:, 1])

    def test_enroll_grows_gallery(self, verifier):
        before = verifier.gallery_size
        verifier.enroll(_faces(4, 2), ["ed", "fi"])
        assert verifier.gallery_size == before + 2

    def test_label_mismatch_raises(self, verifier):
        with pytest.raises(ValueError):
            verifier.enroll(_faces(5, 2), ["one"])

    def test_empty_gallery_raises(self):
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(1), jnp.zeros((1, D)),
                           jnp.zeros((1, D)))
        v = Verifier(lambda x: x.reshape(x.shape[0], -1)[:, :D], params)
        with pytest.raises(ValueError):
            v.identify(_faces(6, 1))


class TestScoreMatrix:
    def test_matrix_matches_pairwise(self, verifier):
        faces = _faces(7, 6)
        m = verifier.score_matrix(faces)
        assert m.shape == (6, 6)
        p = verifier.verify_pairs(faces, faces)
        np.testing.assert_allclose(np.asarray(jnp.diagonal(m)),
                                   np.asarray(p), atol=2e-2)

    def test_sharded_path(self, mesh8):
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        params = head.init(jax.random.PRNGKey(2), jnp.zeros((1, D)),
                           jnp.zeros((1, D)))
        v = Verifier(lambda x: x.reshape(x.shape[0], -1)[:, :D], params,
                     mesh=mesh8)
        m = v.score_matrix(_faces(8, 9))
        assert m.shape == (9, 9)


class TestMicroBatcher:
    def test_results_match_direct_call(self):
        from alink_tpu.serving import MicroBatcher

        fn = lambda x: x * 2.0 + 1.0  # noqa: E731
        with MicroBatcher(fn, max_batch=8, max_delay_s=0.02) as mb:
            futs = [mb.submit(np.full((3,), i, np.float32))
                    for i in range(5)]
            for i, f in enumerate(futs):
                np.testing.assert_allclose(f.result(timeout=10.0),
                                           np.full((3,), 2.0 * i + 1.0))

    def test_coalesces_into_buckets(self):
        from alink_tpu.serving import MicroBatcher

        shapes = []

        def fn(x):
            shapes.append(x.shape[0])
            return x

        with MicroBatcher(fn, max_batch=8, max_delay_s=0.1) as mb:
            futs = [mb.submit(np.zeros((2,), np.float32)) for _ in range(5)]
            [f.result(timeout=10.0) for f in futs]
        # 5 concurrent requests -> one call at the 8-bucket (or a first
        # singleton the worker grabbed before the rest arrived).
        assert all(s in (1, 2, 4, 8) for s in shapes)
        assert sum(shapes) >= 5
        assert len(shapes) <= 3

    def test_lone_request_flushes_on_deadline(self):
        from alink_tpu.serving import MicroBatcher

        with MicroBatcher(lambda x: x, max_batch=64,
                          max_delay_s=0.01) as mb:
            out = mb(np.ones((2,), np.float32))
        np.testing.assert_allclose(out, [1.0, 1.0])

    def test_error_propagates_to_futures(self):
        from alink_tpu.serving import MicroBatcher

        def boom(x):
            raise RuntimeError("model fell over")

        with MicroBatcher(boom, max_batch=4, max_delay_s=0.01) as mb:
            fut = mb.submit(np.zeros((1,), np.float32))
            with pytest.raises(RuntimeError, match="fell over"):
                fut.result(timeout=10.0)

    def test_bad_batch_fails_its_futures_not_the_worker(self):
        """A stacking error (mismatched request shapes) must fail that
        batch's futures and leave the batcher serviceable."""
        from alink_tpu.serving import MicroBatcher

        with MicroBatcher(lambda x: x, max_batch=4,
                          max_delay_s=0.1) as mb:
            f1 = mb.submit(np.zeros((2,), np.float32))
            f2 = mb.submit(np.zeros((3,), np.float32))  # shape mismatch
            errs = 0
            for f in (f1, f2):
                try:
                    f.result(timeout=10.0)
                except ValueError:
                    errs += 1
            assert errs >= 1  # the co-batched pair fails; a lone
            # first request may have slipped through in its own batch
            # Worker must still be alive for fresh requests:
            np.testing.assert_allclose(
                mb(np.ones((2,), np.float32)), [1.0, 1.0])

    def test_submit_after_close_raises(self):
        from alink_tpu.serving import MicroBatcher

        mb = MicroBatcher(lambda x: x)
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            mb.submit(np.zeros((1,), np.float32))

    def test_through_verifier_embed(self, verifier):
        from alink_tpu.serving import MicroBatcher

        faces = _faces(11, 4)
        with MicroBatcher(verifier.embed, max_batch=4,
                          max_delay_s=0.05) as mb:
            futs = [mb.submit(np.asarray(faces[i])) for i in range(4)]
            got = np.stack([f.result(timeout=30.0) for f in futs])
        want = np.asarray(verifier.embed(faces))
        np.testing.assert_allclose(got, want, atol=1e-5)
