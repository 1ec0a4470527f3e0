"""Tests for data/prefetch.py (device-feed prefetching)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.data import DevicePrefetcher, prefetch_to_device


class TestDevicePrefetcher:
    def test_order_preserved(self):
        src = [np.full((4,), i, np.float32) for i in range(10)]
        out = list(DevicePrefetcher(iter(src), depth=3))
        assert len(out) == 10
        for i, x in enumerate(out):
            np.testing.assert_array_equal(np.asarray(x), src[i])

    def test_device_placement(self):
        out = list(DevicePrefetcher([np.ones((2, 2), np.float32)]))
        assert isinstance(out[0], jnp.ndarray)

    def test_pytree_batches(self):
        src = [{"x": np.ones((2,)), "y": (np.zeros((1,)), i)}
               for i in range(3)]
        out = list(DevicePrefetcher(iter(src)))
        assert out[2]["y"][1] == 2
        np.testing.assert_array_equal(np.asarray(out[0]["x"]), [1.0, 1.0])

    def test_exception_propagates(self):
        def gen():
            yield np.zeros((1,))
            raise RuntimeError("decode failed")

        it = DevicePrefetcher(gen())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)

    def test_depth_bounds_readahead(self):
        produced = []

        def gen():
            for i in range(100):
                produced.append(i)
                yield np.full((1,), i, np.float32)

        it = DevicePrefetcher(gen(), depth=2)
        time.sleep(0.3)  # give the worker time to run ahead
        # queue(depth=2) + one item the worker holds while blocked on put.
        assert len(produced) <= 4
        next(it)
        it.close()

    def test_close_stops_worker(self):
        def gen():
            i = 0
            while True:  # infinite source
                yield np.full((1,), i, np.float32)
                i += 1

        it = DevicePrefetcher(gen(), depth=1)
        next(it)
        it.close()
        assert not it._thread.is_alive()

    def test_next_after_close_stops(self):
        it = DevicePrefetcher(iter([np.ones((1,))] * 5), depth=1)
        next(it)
        it.close()
        with pytest.raises(StopIteration):
            while True:
                next(it)

    def test_close_then_next_race_terminates(self):
        """Regression (hung the whole suite once): the worker can land
        one more item AFTER close()'s drain pass — it checks the stop
        flag only after a successful put — filling the depth-1 queue so
        the _DONE sentinel was dropped and the next consumer blocked
        forever.  Iterate the race repeatedly; a bounded watcher thread
        turns any regression into a failure instead of a hang."""
        for round_ in range(30):
            it = DevicePrefetcher(iter([np.ones((1,))] * 5), depth=1)
            next(it)
            it.close()
            out = []
            t = threading.Thread(target=lambda: out.append(
                sum(1 for _ in it)), daemon=True)
            t.start()
            t.join(timeout=10.0)
            assert not t.is_alive(), (
                f"iteration after close() hung (round {round_})")
            # Sticky exhaustion: further next() calls keep terminating.
            with pytest.raises(StopIteration):
                next(it)

    def test_context_manager(self):
        with prefetch_to_device([np.ones((1,))] * 3, depth=1) as it:
            first = next(it)
        np.testing.assert_array_equal(np.asarray(first), [1.0])

    def test_empty_source(self):
        assert list(DevicePrefetcher([])) == []

    def test_depth_validation(self):
        with pytest.raises(ValueError):
            DevicePrefetcher([], depth=0)

    def test_custom_train_through_prefetcher_is_exact(self):
        """Epoch training composes with the prefetcher and — because
        order is preserved — produces the identical trajectory."""
        import jax
        from alink_tpu import train as T
        from alink_tpu.models import SiameseHead

        d = 16
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)

        def gen():
            rng = np.random.default_rng(0)
            while True:
                yield ((rng.random((8, d)).astype(np.float32),
                        rng.random((8, d)).astype(np.float32)),
                       (rng.random(8) > 0.5).astype(np.int32))

        def train(data_iter):
            state = T.create_train_state(
                head, jax.random.PRNGKey(0), np.zeros((2, d)),
                np.zeros((2, d)))
            state, logs = T.custom_train(
                state, data_iter, epochs=1, batch_size=8,
                key=jax.random.PRNGKey(1), n_steps=24)
            return state, logs

        s_raw, l_raw = train(gen())
        with prefetch_to_device(gen(), depth=2) as it:
            s_pre, l_pre = train(it)
        assert l_raw[0].train_loss == l_pre[0].train_loss
        for a, b in zip(jax.tree.leaves(s_raw.params),
                        jax.tree.leaves(s_pre.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_overlap_actually_happens(self):
        """While the consumer sleeps on batch i, the worker must already
        be producing batch i+1 (the whole point of the prefetcher)."""
        events = []
        lock = threading.Lock()

        def gen():
            for i in range(4):
                with lock:
                    events.append(("produce", i))
                yield np.full((1,), i, np.float32)

        it = DevicePrefetcher(gen(), depth=2)
        first = next(it)
        time.sleep(0.2)  # "compute" on first
        with lock:
            ahead = [e for e in events if e[0] == "produce"]
        # More than one batch produced while we held the first.
        assert len(ahead) >= 2
        list(it)
