"""Tests for the active-learning core (active/ vs code/committee.py +
code/ALINK.py:145-259 + code/uncertainty.py + code/learners.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu import train as T
from alink_tpu.active import (
    ActiveLearner,
    ALinkLoop,
    Committee,
    QueryCommittee,
    disparity_masks,
    entropy_sampling,
    intersect_masks,
    margin_sampling,
    oracle_gate,
    select_queries,
    uncertainty_sampling,
)
from alink_tpu.config import ALinkConfig
from alink_tpu.data.loader import PersonStacks
from alink_tpu.models import SiameseHead

D = 32


def _head_params(seed):
    head = SiameseHead(dtype=jnp.float32)
    return head, head.init(jax.random.PRNGKey(seed), jnp.zeros((1, D)),
                           jnp.zeros((1, D)))


class TestCommittee:
    def test_predict_is_member_mean(self):
        head, p0 = _head_params(0)
        _, p1 = _head_params(1)
        com = Committee.from_param_list(head, [p0, p1])
        left = jax.random.normal(jax.random.PRNGKey(2), (5, D))
        right = jax.random.normal(jax.random.PRNGKey(3), (5, D))
        mean = com.predict(left, right)
        a = head.apply(p0, left, right)
        b = head.apply(p1, left, right)
        np.testing.assert_allclose(np.asarray(mean), np.asarray((a + b) / 2),
                                   atol=1e-5)
        assert com.num_members == 2

    def test_member_roundtrip(self):
        head, p0 = _head_params(0)
        _, p1 = _head_params(1)
        com = Committee.from_param_list(head, [p0, p1])
        back = com.member_params(1)
        for x, y in zip(jax.tree.leaves(back), jax.tree.leaves(p1)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_attack_model_fan_out(self):
        head, p0 = _head_params(0)
        com = Committee.from_param_list(head, [p0],
                                        noise_names=("gaussian", "speckle"))
        left = jax.random.uniform(jax.random.PRNGKey(4), (3, 16, 16, 3)) * 255
        right = jax.random.uniform(jax.random.PRNGKey(5), (3, 16, 16, 3)) * 255
        nl, nr = com.attack_model(jax.random.PRNGKey(6), left, right, (8, 8))
        assert nl.shape == (2, 3, 8, 8, 3)
        assert nr.shape == (2, 3, 8, 8, 3)
        # Channels differ from each other.
        assert float(jnp.max(jnp.abs(nl[0] - nl[1]))) > 1.0

    def test_adversarial_requires_predict_fn(self):
        head, p0 = _head_params(0)
        com = Committee.from_param_list(head, [p0],
                                        noise_names=("adversarial",))
        left = jnp.zeros((2, 8, 8, 3))
        with pytest.raises(ValueError):
            com.attack_model(jax.random.PRNGKey(0), left, left, (8, 8))


class TestSelection:
    def test_disparity_topk(self):
        student = jnp.array([[0.9, 0.5, 0.1, 0.5]])  # K=1, N=4
        committee = jnp.array([0.1, 0.5, 0.9, 0.6])
        masks = disparity_masks(student, committee, 0.5, False)
        # |c1-c2| = [.8, 0, .8, .1]; top half = indices 0, 2.
        np.testing.assert_array_equal(np.asarray(masks[0]),
                                      [True, False, True, False])

    def test_blind_strategy(self):
        student = jnp.array([[0.9, 0.4, 0.6]])
        committee = jnp.array([0.1, 0.45, 0.9])
        masks = disparity_masks(student, committee, 0.25, True)
        np.testing.assert_array_equal(np.asarray(masks[0]),
                                      [True, False, False])

    def test_intersection(self):
        masks = jnp.array([[True, True, False], [True, False, False]])
        np.testing.assert_array_equal(np.asarray(intersect_masks(masks)),
                                      [True, False, False])

    def test_oracle_gate_counts_and_agreement(self):
        selected = jnp.array([True, True, True, False])
        committee = jnp.array([0.9, 0.52, 0.1, 0.9])
        labels = jnp.array([1.0, 1.0, 1.0, 1.0])
        queried, charges = oracle_gate(selected, committee, labels, eps=0.05)
        # idx 0: confident & correct -> charged + queried.
        # idx 1: inside grey band (0.45..0.55) -> neither.
        # idx 2: confident but wrong (0.1 vs label 1) -> charged only.
        # idx 3: not selected.
        np.testing.assert_array_equal(np.asarray(queried),
                                      [True, False, False, False])
        assert int(charges) == 2

    def test_select_queries_end_to_end(self):
        k, n = 3, 8
        rng = np.random.default_rng(0)
        student = jnp.asarray(rng.random((k, n)), jnp.float32)
        committee = jnp.asarray(rng.random(n), jnp.float32)
        labels = jnp.asarray((rng.random(n) > 0.5).astype(np.float32))
        res = select_queries(student, committee, labels,
                             disparity_ratio=0.5, blind_strategy=False,
                             eps=0.05)
        assert res.selected.shape == (n,)
        assert bool(jnp.all(~res.queried | res.selected))
        assert int(res.oracle_charges) >= int(res.queried.sum())


class TestUncertainty:
    def test_measures_ranking(self):
        probs = jnp.array([[0.99, 0.01], [0.6, 0.4], [0.5, 0.5]])
        idx = uncertainty_sampling(probs, 1)
        assert int(idx[0]) == 2
        idx = margin_sampling(probs, 2)
        assert set(np.asarray(idx).tolist()) == {1, 2}
        idx = entropy_sampling(probs, 1)
        assert int(idx[0]) == 2


class TestLearners:
    def test_active_learner_teach_improves(self):
        head = SiameseHead(dtype=jnp.float32)
        state = T.create_train_state(head, jax.random.PRNGKey(0),
                                     jnp.zeros((2, D)), jnp.zeros((2, D)))
        learner = ActiveLearner(state, epochs=3, batch_size=32,
                                validation_split=0.0)
        rng = np.random.default_rng(1)
        base = rng.normal(size=(256, D)).astype(np.float32)
        y = (rng.random(256) > 0.5).astype(np.int32)
        right = np.where(y[:, None] == 1, base + 0.05, base + rng.normal(
            size=(256, D)).astype(np.float32) * 2)
        before = learner.score(base, right, y)
        learner.teach(base, right, y)
        after = learner.score(base, right, y)
        assert after >= before
        idx = learner.query(base, right, n_instances=5)
        assert len(idx) == 5

    def test_query_committee_disagreement(self):
        head, p0 = _head_params(0)
        _, p1 = _head_params(5)
        qc = QueryCommittee(Committee.from_param_list(head, [p0, p1]))
        left = jax.random.normal(jax.random.PRNGKey(6), (7, D))
        right = jax.random.normal(jax.random.PRNGKey(7), (7, D))
        votes = qc.vote(left, right)
        assert votes.shape == (2, 7)
        ent = qc.vote_entropy(left, right)
        assert ent.shape == (7,)
        idx = qc.query(left, right, 3)
        assert len(idx) == 3
        # Max-entropy indices must be where members disagree (if any).
        disagree = np.asarray(votes[0] != votes[1])
        if disagree.any():
            assert disagree[int(idx[0])]


def _identity_featurize(imgs):
    """Flatten tiny images as 'features' for loop tests."""
    return imgs.reshape(imgs.shape[0], -1)


class TestALinkLoop:
    def _setup(self, noise_names=("gaussian", "speckle"), **cfg_kwargs):
        size = 4  # 4x4x3 -> 48-d features
        d = size * size * 3
        head = SiameseHead(widths=(16, 8), dtype=jnp.float32)
        m2 = T.create_train_state(head, jax.random.PRNGKey(0),
                                  jnp.zeros((2, d)), jnp.zeros((2, d)))
        _, p0 = head, head.init(jax.random.PRNGKey(1), jnp.zeros((1, d)),
                                jnp.zeros((1, d)))
        com = Committee.from_param_list(head, [p0], noise_names=noise_names)
        cfg = ALinkConfig(
            noise=noise_names,
            image_res=(size, size),
            feature_res=d,
            alink_bs=2,
            batch_send=4,
            ft_epochs=1,
            mixture_ratio=1,
            disparity_ratio=0.9,
            eps=0.01,
            **cfg_kwargs,
        )

        def replay():
            rng = np.random.default_rng(3)
            while True:
                l = rng.random((8, d)).astype(np.float32)
                r = rng.random((8, d)).astype(np.float32)
                yield (l, r), (rng.random(8) > 0.5).astype(np.int32)

        loop = ALinkLoop(cfg, featurize=_identity_featurize, committee=com,
                         m2_state=m2, replay_gen=replay(),
                         key=jax.random.PRNGKey(4))

        rng = np.random.default_rng(5)
        p = 6
        plain = PersonStacks(
            rng.random((p, 2, size, size, 3)).astype(np.float32) * 255,
            np.full(p, 2, np.int32))
        dig = PersonStacks(
            rng.random((p, 2, size, size, 3)).astype(np.float32) * 255,
            np.full(p, 2, np.int32))
        return loop, plain, dig

    def test_full_loop_runs_and_counts(self):
        loop, plain, dig = self._setup()
        state = loop.run(plain, dig)
        assert state.un_size > 0
        assert len(loop.logs) >= 1
        # Oracle accounting: charges accumulate monotonically.
        counts = [log.active_count for log in loop.logs]
        assert counts == sorted(counts)
        # UN_SIZE grows by the all-pairs count per slab:
        # (2 persons x 2 imgs) x (2 x 2) + (2x2 x 2x2) = 16 + 16 = 32.
        assert loop.logs[0].pairs == 32

    def test_active_ratio_stops_early(self):
        loop, plain, dig = self._setup(active_ratio=0.0)
        state = loop.run(plain, dig)
        # active_ratio 0 halts after the first slab (ALINK.py:257-259).
        assert len(loop.logs) == 1
        assert state.pool_cursor == loop.config.alink_bs

    def test_finetune_path_triggers(self):
        loop, plain, dig = self._setup()
        loop.run(plain, dig)
        # With disparity_ratio 0.9 and tiny eps the queue should have
        # crossed batch_send at least once.
        assert any(log.finetuned for log in loop.logs)

    def test_blind_strategy_runs(self):
        loop, plain, dig = self._setup(blind_strategy=True)
        loop.run(plain, dig)
        assert loop.state.un_size > 0

    def test_augment_path_runs(self):
        loop, plain, dig = self._setup(augment=True)
        loop.run(plain, dig)
        assert loop.state.un_size > 0


class TestLoopCheckpoint:
    def test_save_restore_resume(self, tmp_path):
        helper = TestALinkLoop()
        loop, plain, dig = helper._setup()
        # Run two iterations, checkpoint, then resume into a fresh loop.
        loop.run_iteration(plain.take_people([0, 1]),
                           dig.take_people([0, 1]))
        loop.state.pool_cursor = 2
        path = str(tmp_path / "loop_ck")
        loop.save(path)

        loop2, _, _ = helper._setup()
        assert loop2.restore(path)
        assert loop2.state.active_count == loop.state.active_count
        assert loop2.state.un_size == loop.state.un_size
        assert loop2.state.pool_cursor == 2
        assert loop2.state.buffer_size() == loop.state.buffer_size()
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(loop2.state.m2_state.params)[0]),
            np.asarray(jax.tree.leaves(loop.state.m2_state.params)[0]),
        )
        # Resumed loop continues from the cursor.
        state = loop2.run(plain, dig)
        assert state.pool_cursor >= 2

    def test_restore_missing_returns_false(self, tmp_path):
        helper = TestALinkLoop()
        loop, _, _ = helper._setup()
        assert not loop.restore(str(tmp_path / "nope"))


class TestFGSMChannel:
    def test_fgsm_in_noise_bank(self):
        helper = TestALinkLoop()
        loop, plain, dig = helper._setup(noise_names=("gaussian", "fgsm"))

        def adv_predict(params, l, r):
            fl = _identity_featurize(l)
            fr = _identity_featurize(r)
            from alink_tpu.ops.pairwise import pair_scores
            p = pair_scores(params, fl, fr)
            return jnp.stack([1 - p, p], -1)

        loop.adversarial_predict = adv_predict
        log = loop.run_iteration(plain.take_people([0, 1]),
                                 dig.take_people([0, 1]))
        assert log.pairs > 0


class TestDeviceChunking:
    def test_chunked_matches_whole(self):
        """Chunked device passes (device_batch < N) must yield the same
        selection as one pass."""
        helper = TestALinkLoop()
        loop_a, plain, dig = helper._setup()
        loop_b, _, _ = helper._setup()
        loop_b.device_batch = 8  # pairs per slab = 32 -> 4 chunks
        la = loop_a.run_iteration(plain.take_people([0, 1]),
                                  dig.take_people([0, 1]))
        lb = loop_b.run_iteration(plain.take_people([0, 1]),
                                  dig.take_people([0, 1]))
        # Noise draws use the same key stream but different batch shapes,
        # so noisy pixels differ; deterministic fields must agree.
        assert la.pairs == lb.pairs
        assert la.un_size == lb.un_size


class TestBayesianOptimizer:
    def test_tracks_max_and_queries_greedy(self):
        from alink_tpu.active import BayesianOptimizer

        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        state = T.create_train_state(head, jax.random.PRNGKey(0),
                                     jnp.zeros((2, D)), jnp.zeros((2, D)))
        bo = BayesianOptimizer(state, epochs=1, batch_size=8,
                               validation_split=0.0)
        rng = np.random.default_rng(0)
        left = rng.normal(size=(16, D)).astype(np.float32)
        right = rng.normal(size=(16, D)).astype(np.float32)
        y = (rng.random(16) > 0.5).astype(np.int32)
        bo.fit(left, right, y)
        x_max, y_max = bo.get_max()
        assert y_max == float(y.max())
        idx = bo.query(left, right, n_instances=3)
        assert len(idx) == 3
        # Greedy acquisition: queried indices have the highest P(genuine).
        probs = np.asarray(jax.nn.softmax(
            bo.predict_proba(left, right), axis=-1))[:, 1]
        assert set(idx.tolist()) == set(np.argsort(probs)[-3:].tolist())


class TestCommitteeRegressor:
    def test_consensus_and_disagreement(self):
        from alink_tpu.active import CommitteeRegressor

        def make_member(scale):
            def predict(params, l, r):
                return params * jnp.mean(jnp.abs(l - r), axis=-1)
            return (jnp.float32(scale), predict)

        cr = CommitteeRegressor([make_member(1.0), make_member(3.0)])
        l = jax.random.normal(jax.random.PRNGKey(0), (5, D))
        r = jax.random.normal(jax.random.PRNGKey(1), (5, D))
        mean, std = cr.predict(l, r, return_std=True)
        base = jnp.mean(jnp.abs(l - r), axis=-1)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(2.0 * base),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(std), np.asarray(base),
                                   rtol=1e-5)
        idx = cr.query(l, r, n_instances=2)
        want = np.argsort(np.asarray(std))[-2:]
        assert set(idx.tolist()) == set(want.tolist())
