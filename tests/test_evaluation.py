"""Tests for the evaluation engine (evaluation/ vs utilities/*)."""

import numpy as np
import pytest

from alink_tpu.data.loader import PersonStacks
from alink_tpu.evaluation import (
    gallery_top1,
    gar_at_far,
    masked_scores,
    roc_from_scores,
    roc_stats,
    score_histograms,
    threshold_sweep,
)


def _reference_sweep(genuine, imposter, thresholds):
    """The reference's O(n*t) double loop (ROC_precompute.py:48-66)."""
    tpr, fpr = [], []
    for t in thresholds:
        tpr.append(sum(1 for g in genuine if g >= t) / len(genuine))
        fpr.append(sum(1 for s in imposter if s >= t) / len(imposter))
    return np.array(tpr), np.array(fpr)


class TestMaskSplit:
    def _fixture(self):
        rng = np.random.default_rng(0)
        n = 12
        scores = rng.random((n, n))
        mask = rng.integers(0, 5, (n, n))  # 0 = unscored
        return scores, mask

    def test_upper_triangle_only(self):
        scores, mask = self._fixture()
        gen, imp = masked_scores(scores, mask, case=3)
        total_upper = np.triu(np.ones_like(mask, bool), 1)
        want_gen = int(np.sum(np.isin(mask, (1, 2)) & total_upper))
        want_imp = int(np.sum(np.isin(mask, (3, 4)) & total_upper))
        assert len(gen) == want_gen
        assert len(imp) == want_imp

    def test_cases_partition(self):
        scores, mask = self._fixture()
        g1, i1 = masked_scores(scores, mask, 1)
        g2, i2 = masked_scores(scores, mask, 2)
        g3, i3 = masked_scores(scores, mask, 3)
        assert len(g1) + len(g2) == len(g3)
        assert len(i1) + len(i2) == len(i3)

    def test_bad_case_raises(self):
        scores, mask = self._fixture()
        with pytest.raises(ValueError):
            masked_scores(scores, mask, 0)


class TestSweep:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(1)
        genuine = rng.beta(5, 2, 300)
        imposter = rng.beta(2, 5, 500)
        thresholds = np.linspace(0, 1, 101)
        tpr, fpr = threshold_sweep(genuine, imposter, thresholds)
        rtpr, rfpr = _reference_sweep(genuine, imposter, thresholds)
        np.testing.assert_allclose(np.asarray(tpr), rtpr, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fpr), rfpr, atol=1e-6)

    def test_monotone(self):
        rng = np.random.default_rng(2)
        tpr, fpr = threshold_sweep(rng.random(100), rng.random(100),
                                   np.linspace(0, 1, 50))
        assert np.all(np.diff(np.asarray(tpr)) <= 1e-9)
        assert np.all(np.diff(np.asarray(fpr)) <= 1e-9)


class TestStats:
    def test_perfect_separation(self):
        genuine = np.full(100, 0.9)
        imposter = np.full(100, 0.1)
        tpr, fpr = threshold_sweep(genuine, imposter, np.linspace(0, 1, 201))
        stats = roc_stats(np.asarray(tpr), np.asarray(fpr))
        assert stats.auc > 0.99
        assert stats.eer < 0.01
        assert stats.gar_at_1pct_far == 1.0

    def test_random_scores_auc_half(self):
        rng = np.random.default_rng(3)
        tpr, fpr = threshold_sweep(rng.random(5000), rng.random(5000),
                                   np.linspace(0, 1, 1001))
        stats = roc_stats(np.asarray(tpr), np.asarray(fpr))
        assert abs(stats.auc - 0.5) < 0.05
        assert abs(stats.eer - 0.5) < 0.05

    def test_gar_at_far_nearest_semantics(self):
        fpr = np.array([0.5, 0.011, 0.0009, 0.0])
        tpr = np.array([1.0, 0.9, 0.7, 0.1])
        assert gar_at_far(tpr, fpr, 0.010) == 0.9
        assert gar_at_far(tpr, fpr, 0.0010) == 0.7


class TestEndToEnd:
    def test_roc_from_scores_chain(self):
        """Synthetic DFW-like protocol: separable scores must yield a
        near-perfect ROC through the full chain."""
        rng = np.random.default_rng(4)
        n = 40
        mask = np.zeros((n, n), int)
        iu = np.triu_indices(n, 1)
        mask[iu] = rng.integers(1, 5, len(iu[0]))
        scores = np.zeros((n, n))
        scores[np.isin(mask, (1, 2))] = rng.beta(20, 2, np.sum(np.isin(mask, (1, 2))))
        scores[np.isin(mask, (3, 4))] = rng.beta(2, 20, np.sum(np.isin(mask, (3, 4))))
        for case in (1, 2, 3):
            tpr, fpr, stats = roc_from_scores(scores, mask, case)
            assert stats.auc > 0.95, (case, stats)

    def test_histograms(self):
        hg, hi, edges = score_histograms(np.array([0.9] * 5),
                                         np.array([0.1] * 7))
        assert hg.sum() == 5
        assert hi.sum() == 7
        assert len(edges) == 101


class TestIdentification:
    def test_gallery_top1(self):
        # 3 subjects, 3 images each, 2-D "images" equal to subject id.
        images = np.zeros((3, 3, 2), np.float32)
        for p in range(3):
            images[p, :, 0] = p
        stacks = PersonStacks(images, np.array([3, 3, 3], np.int32))

        def score_fn(probes, gallery):
            d = np.abs(probes[:, None, 0] - gallery[None, :, 0])
            return 1.0 - d

        assert gallery_top1(score_fn, stacks) == 1.0

    def test_gallery_top1_chance(self):
        rng = np.random.default_rng(5)
        images = rng.random((4, 3, 2)).astype(np.float32)
        stacks = PersonStacks(images, np.array([3, 3, 3, 3], np.int32))
        acc = gallery_top1(lambda p, g: rng.random((len(p), len(g))), stacks)
        assert 0.0 <= acc <= 1.0
