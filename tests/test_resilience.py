"""Tests for utils/resilience.py (SURVEY.md section 5.3: failure
detection + retry/elastic recovery — greenfield; the reference loses all
state on interruption, code/ALINK.py:135-143)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu import train as T
from alink_tpu.active import ALinkLoop, Committee
from alink_tpu.config import ALinkConfig
from alink_tpu.data.loader import PersonStacks
from alink_tpu.models import SiameseHead
from alink_tpu.utils.resilience import (
    Heartbeat,
    PeerFailure,
    RetryReport,
    barrier,
    run_with_retries,
)


class TestRunWithRetries:
    def test_success_first_try(self):
        report = RetryReport()
        out = run_with_retries(lambda a: a + 41, report=report)
        assert out == 41
        assert report.attempts == 1
        assert report.failures == []

    def test_retryable_failure_then_success(self):
        calls = []
        sleeps = []

        def step(attempt):
            calls.append(attempt)
            if attempt < 2:
                raise RuntimeError(f"device halt {attempt}")
            return "ok"

        report = RetryReport()
        out = run_with_retries(step, backoff_s=1.0, backoff_factor=2.0,
                               report=report, _sleep=sleeps.append)
        assert out == "ok"
        assert calls == [0, 1, 2]
        assert sleeps == [1.0, 2.0]  # exponential backoff
        assert report.attempts == 3
        assert len(report.failures) == 2

    def test_budget_exhausted_reraises(self):
        def step(attempt):
            raise RuntimeError("always down")

        with pytest.raises(RuntimeError, match="always down"):
            run_with_retries(step, max_restarts=2, _sleep=lambda s: None)

    def test_bug_not_retried(self):
        calls = []

        def step(attempt):
            calls.append(attempt)
            raise ValueError("programming error")

        with pytest.raises(ValueError):
            run_with_retries(step, _sleep=lambda s: None)
        assert calls == [0]  # no retry on non-retryable types

    def test_fatal_subclass_not_retried(self):
        # NotImplementedError subclasses RuntimeError but is a bug.
        calls = []

        def step(attempt):
            calls.append(attempt)
            raise NotImplementedError("missing piece")

        with pytest.raises(NotImplementedError):
            run_with_retries(step, _sleep=lambda s: None)
        assert calls == [0]

    def test_on_restart_hook(self):
        seen = []

        def step(attempt):
            if attempt == 0:
                raise OSError("shared fs hiccup")
            return attempt

        out = run_with_retries(
            step, on_restart=lambda a, e: seen.append((a, str(e))),
            _sleep=lambda s: None)
        assert out == 1
        assert seen == [(0, "shared fs hiccup")]


class TestLoopSupervision:
    """run_with_retries + ALinkLoop checkpointing = crash-and-resume
    supervision that reproduces the uninterrupted trajectory."""

    def _setup(self):
        size = 4
        d = size * size * 3
        head = SiameseHead(widths=(16, 8), dtype=jnp.float32)
        m2 = T.create_train_state(head, jax.random.PRNGKey(0),
                                  jnp.zeros((2, d)), jnp.zeros((2, d)))
        p0 = head.init(jax.random.PRNGKey(1), jnp.zeros((1, d)),
                       jnp.zeros((1, d)))
        com = Committee.from_param_list(head, [p0],
                                        noise_names=("gaussian",))
        cfg = ALinkConfig(noise=("gaussian",), image_res=(size, size),
                          feature_res=d, alink_bs=2, batch_send=4,
                          ft_epochs=1, mixture_ratio=1,
                          disparity_ratio=0.9, eps=0.01)

        def replay():
            rng = np.random.default_rng(3)
            while True:
                le = rng.random((8, d)).astype(np.float32)
                r = rng.random((8, d)).astype(np.float32)
                yield (le, r), (rng.random(8) > 0.5).astype(np.int32)

        featurize = lambda imgs: jnp.reshape(jnp.asarray(imgs),  # noqa: E731
                                             (imgs.shape[0], -1)) / 255.0
        loop = ALinkLoop(cfg, featurize=featurize, committee=com,
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

    @pytest.mark.slow
    def test_supervised_crash_resumes_identically(self, tmp_path):
        # Ground truth: uninterrupted run.
        loop_a, plain, dig = self._setup()
        state_a = loop_a.run(plain, dig,
                             checkpoint_path=str(tmp_path / "gt"))

        # Supervised run: a fresh loop per attempt (process restart);
        # attempt 0 "crashes" after the first checkpointed iteration.
        path = str(tmp_path / "sup")

        def step(attempt):
            loop, pl, dg = self._setup()
            if attempt == 0:
                orig = loop.run_iteration
                count = {"n": 0}

                def flaky(*args, **kwargs):
                    if count["n"] >= 1:
                        raise RuntimeError("injected device halt")
                    count["n"] += 1
                    return orig(*args, **kwargs)

                loop.run_iteration = flaky
            state = loop.run(pl, dg, checkpoint_path=path,
                             checkpoint_every=1)
            return loop, state

        report = RetryReport()
        loop_c, state_c = run_with_retries(step, report=report,
                                           _sleep=lambda s: None)
        assert report.attempts == 2
        assert "injected device halt" in report.failures[0]
        assert state_c.active_count == state_a.active_count
        assert state_c.un_size == state_a.un_size
        assert state_c.pool_cursor == state_a.pool_cursor
        for a, c in zip(jax.tree.leaves(state_a.m2_state.params),
                        jax.tree.leaves(state_c.m2_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-6)


class TestLoopHeartbeat:
    def test_dead_peer_fails_fast(self, tmp_path):
        """run(heartbeat=) surfaces a dead peer as PeerFailure instead of
        letting the next collective block forever."""
        helper = TestLoopSupervision()
        loop, plain, dig = helper._setup()
        hb = Heartbeat(str(tmp_path), 0, 2)
        # Peer 1 beat long ago and died.
        stale = time.time() - 1200.0
        peer = os.path.join(str(tmp_path), "heartbeat_1")
        open(peer, "w").close()
        os.utime(peer, (stale, stale))
        with pytest.raises(PeerFailure):
            loop.run(plain, dig, heartbeat=hb, heartbeat_timeout_s=600.0)

    def test_live_peers_complete(self, tmp_path):
        helper = TestLoopSupervision()
        loop, plain, dig = helper._setup()
        hb = Heartbeat(str(tmp_path), 0, 1)  # single process: no peers
        state = loop.run(plain, dig, heartbeat=hb)
        assert state.un_size > 0
        assert hb.last_seen(0) is not None


class TestHeartbeat:
    def test_beat_and_check(self, tmp_path):
        d = str(tmp_path)
        h0 = Heartbeat(d, 0, 2)
        h1 = Heartbeat(d, 1, 2)
        h0.beat()
        h1.beat()
        assert h0.check_peers(timeout_s=60.0) == []
        assert h0.last_seen(1) is not None
        assert h0.last_seen(1) < 5.0

    def test_stale_peer_detected(self, tmp_path):
        d = str(tmp_path)
        h0 = Heartbeat(d, 0, 3)
        h1 = Heartbeat(d, 1, 3)
        h2 = Heartbeat(d, 2, 3)
        for h in (h0, h1, h2):
            h.beat()
        # Age peer 2's beacon far past the deadline.
        stale = time.time() - 120.0
        os.utime(os.path.join(d, "heartbeat_2"), (stale, stale))
        assert h0.check_peers(timeout_s=60.0) == [2]
        with pytest.raises(PeerFailure, match=r"\[2\]"):
            h0.ensure_peers_alive(timeout_s=60.0)

    def test_startup_grace_for_unseen_peer(self, tmp_path):
        d = str(tmp_path)
        h0 = Heartbeat(d, 0, 2)
        h0.beat()
        # Peer 1 never beat, but process 0 only just started: grace.
        assert h0.check_peers(timeout_s=60.0) == []
        # Grace anchors to the FIRST beat, not the freshest one —
        # otherwise per-iteration beats would extend it forever and a
        # peer that never launched would never be reported.
        h0._first_beat = time.time() - 120.0
        h0.beat()  # keeps beating; must NOT reset the grace window
        assert h0.check_peers(timeout_s=60.0) == [1]

    def test_peer_failure_is_fatal_for_retries(self):
        calls = []

        def step(attempt):
            calls.append(attempt)
            raise PeerFailure("process(es) [1] missed the deadline")

        with pytest.raises(PeerFailure):
            run_with_retries(step, _sleep=lambda s: None)
        # A dead peer needs a job-level restart: never retried in-process.
        assert calls == [0]


class TestBarrier:
    def test_all_present_returns(self, tmp_path):
        from alink_tpu.utils.resilience import _drop_marker

        d = str(tmp_path)
        hs = [Heartbeat(d, p, 3) for p in range(3)]
        # Peers 1 and 2 already arrived: beacon + session-stamped marker.
        for h in hs[1:]:
            h.beat()
            _drop_marker(h, "sync0")
        barrier(hs[0], "sync0", timeout_s=5.0, _sleep=lambda s: None)

    def test_timeout_names_missing(self, tmp_path):
        d = str(tmp_path)
        h0 = Heartbeat(d, 0, 2)
        clock = iter(range(100))
        with pytest.raises(PeerFailure, match=r"missing process\(es\) \[1\]"):
            barrier(h0, "sync1", timeout_s=3.0, _sleep=lambda s: None,
                    _clock=lambda: float(next(clock)))

    def test_late_arrival_releases(self, tmp_path):
        from alink_tpu.utils.resilience import _drop_marker

        d = str(tmp_path)
        h0 = Heartbeat(d, 0, 2)
        h1 = Heartbeat(d, 1, 2)
        arrivals = {"n": 0}

        def late_sleep(_):
            arrivals["n"] += 1
            if arrivals["n"] == 2:  # peer shows up on the second poll
                h1.beat()
                _drop_marker(h1, "sync2")

        barrier(h0, "sync2", timeout_s=60.0, _sleep=late_sleep)
        assert arrivals["n"] == 2

    def test_stale_markers_from_previous_attempt_do_not_satisfy(
            self, tmp_path):
        """Restart scenario: markers left by a pre-crash incarnation must
        NOT release a post-restart barrier (the peer's new beacon
        carries a different session)."""
        from alink_tpu.utils.resilience import _drop_marker

        d = str(tmp_path)
        old_h1 = Heartbeat(d, 1, 2)
        old_h1.beat()
        _drop_marker(old_h1, "iter_3")     # pre-crash attempt's marker
        new_h1 = Heartbeat(d, 1, 2)        # peer restarted: new session
        new_h1.beat()                      # beacon now carries new nonce
        h0 = Heartbeat(d, 0, 2)
        clock = iter(range(100))
        with pytest.raises(PeerFailure, match=r"missing process\(es\) \[1\]"):
            barrier(h0, "iter_3", timeout_s=3.0, _sleep=lambda s: None,
                    _clock=lambda: float(next(clock)))
        # ... and once the restarted peer re-arrives, it releases.
        _drop_marker(new_h1, "iter_3")
        barrier(h0, "iter_3", timeout_s=3.0, _sleep=lambda s: None)

    def test_probe_before_first_beat_is_grace(self, tmp_path):
        """check_peers before this process's own first beat must treat
        never-seen peers as still starting up, not dead."""
        h0 = Heartbeat(str(tmp_path), 0, 3)
        assert h0.check_peers(timeout_s=60.0) == []
