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
