"""Tests for utils/ (profiling, metrics, helpers) and data/face_image.py."""

import json
import os

import numpy as np
import pytest

from alink_tpu.data import face_image
from alink_tpu.utils import (
    MetricsLogger,
    Timings,
    calculate_accuracy,
    confusion_counts,
    one_hot,
    roundoff,
    unison_split,
)


class TestHelpers:
    def test_roundoff(self):
        np.testing.assert_array_equal(
            roundoff(np.array([0.1, 0.5, 0.9])), [0, 1, 1])

    def test_one_hot(self):
        np.testing.assert_array_equal(
            one_hot(np.array([0, 1])), [[1, 0], [0, 1]])

    def test_unison_split(self):
        x = np.arange(10)
        y = np.arange(10) * 2
        (xl, yl), (xr, yr) = unison_split(x, y, 0.4, seed=0)
        assert len(xl) == 4 and len(xr) == 6
        np.testing.assert_array_equal(yl, xl * 2)
        np.testing.assert_array_equal(yr, xr * 2)

    def test_calculate_accuracy(self):
        preds = np.array([[0.9, 0.1], [0.2, 0.8], [0.9, 0.1]])
        labels = one_hot(np.array([0, 1, 1]))
        assert abs(calculate_accuracy(preds, labels) - 2 / 3) < 1e-9

    def test_confusion_counts(self):
        counts = confusion_counts([0, 0, 1, 1], [0, 1, 1, 1])
        np.testing.assert_array_equal(counts, [[1, 1], [0, 2]])


class TestTimings:
    def test_phase_accumulation(self):
        t = Timings()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        assert t.counts["a"] == 2
        assert t.counts["b"] == 1
        assert "a" in t.report() and "ms/call" in t.report()

    def test_timed(self):
        import jax.numpy as jnp

        t = Timings()
        out = t.timed("mul", lambda: jnp.ones(4) * 2)
        assert float(out[0]) == 2.0
        assert t.counts["mul"] == 1


class TestMetricsLogger:
    def test_jsonl_and_echo(self, tmp_path, capsys):
        path = str(tmp_path / "m.jsonl")
        with MetricsLogger(path) as logger:
            logger.log("iteration", active_count=3, queried=2)
        lines = open(path).read().strip().splitlines()
        rec = json.loads(lines[0])
        assert rec["event"] == "iteration"
        assert rec["active_count"] == 3
        assert "active_count=3" in capsys.readouterr().out


class TestFaceImage:
    def test_property(self, tmp_path):
        (tmp_path / "property").write_text("100,112,112\n")
        prop = face_image.load_property(str(tmp_path))
        assert prop.num_classes == 100
        assert prop.image_size == (112, 112)

    def test_common_tree_with_json(self, tmp_path):
        d = tmp_path / "ds"
        for person in ("alice", "bob"):
            (d / person).mkdir(parents=True)
            (d / person / "a.jpg").write_bytes(b"x")
        ann = {"bounding_box": {"x": 1, "y": 2, "width": 3, "height": 4},
               "landmarks": {"0": {"x": 5, "y": 6}, "1": {"x": 7, "y": 8},
                             "2": {"x": 9, "y": 10}}}
        (d / "alice" / "a.jpg.json").write_text(json.dumps(ann))
        recs = face_image.get_dataset("megaface", str(d))
        assert len(recs) == 2
        alice = [r for r in recs if "alice" in r.image_path][0]
        np.testing.assert_array_equal(alice.bbox, [1, 2, 4, 6])
        # Landmark order is 1, 0, 2 (face_image.py:124-131).
        np.testing.assert_array_equal(alice.landmark,
                                      [[7, 8], [5, 6], [9, 10]])
        assert recs[0].classname != recs[1].classname

    def test_list_file(self, tmp_path):
        d = tmp_path / "web"
        d.mkdir()
        (tmp_path / "web_clean_list.txt").write_text(
            "p1/a.jpg 0\np2\\b.jpg 1\n")
        recs = face_image.get_dataset("webface", str(d))
        assert len(recs) == 2
        assert recs[1].id == "p2/b.jpg"  # backslash normalised

    def test_fgnet_stub_and_unknown(self, tmp_path):
        assert face_image.get_dataset("fgnet", str(tmp_path)) == []
        assert face_image.get_dataset("nope", str(tmp_path)) is None


class TestLstLine:
    def test_full_record(self):
        line = "1\timg/a.jpg\t7\t1\t2\t30\t40\t" + "\t".join(
            str(float(v)) for v in range(10, 20))
        path, label, bbox, lmk, aligned = face_image.parse_lst_line(line)
        assert (path, label, aligned) == ("img/a.jpg", 7, 1)
        np.testing.assert_array_equal(bbox, [1, 2, 30, 40])
        # 2x5 column-major -> (5, 2): x from first five, y from last five.
        np.testing.assert_array_equal(lmk[:, 0], [10, 11, 12, 13, 14])
        np.testing.assert_array_equal(lmk[:, 1], [15, 16, 17, 18, 19])

    def test_minimal_record(self):
        path, label, bbox, lmk, aligned = face_image.parse_lst_line(
            "0\tx.jpg\t3")
        assert bbox is None and lmk is None and aligned == 0

    def test_read_image_modes(self, tmp_path):
        from PIL import Image

        arr = np.zeros((4, 6, 3), np.uint8)
        arr[..., 0] = 200  # red
        p = str(tmp_path / "x.png")
        Image.fromarray(arr).save(p)
        rgb = face_image.read_image(p)
        assert rgb.shape == (4, 6, 3) and rgb[0, 0, 0] == 200
        bgr = face_image.read_image(p, mode="bgr")
        assert bgr[0, 0, 2] == 200
        chw = face_image.read_image(p, layout="CHW")
        assert chw.shape == (3, 4, 6)
        gray = face_image.read_image(p, mode="gray")
        assert gray.shape == (4, 6)


class TestNanGuard:
    """utils/debug.py — the opt-in numeric sanitizer (SURVEY.md §5.2)."""

    def test_disabled_is_noop(self):
        import jax.numpy as jnp

        from alink_tpu.utils import debug

        debug.enable_nan_guard(False)
        debug.check_finite(jnp.array([jnp.nan]), "phase")  # no raise

    def test_force_raises_on_nan_and_names_phase(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from alink_tpu.utils import debug

        with _pytest.raises(FloatingPointError, match="selection"):
            debug.check_finite(
                {"a": jnp.ones(3), "b": jnp.array([1.0, jnp.inf])},
                "selection", force=True)

    def test_enabled_global_switch(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from alink_tpu.utils import debug

        debug.enable_nan_guard(True)
        try:
            with _pytest.raises(FloatingPointError):
                debug.check_finite(jnp.array([jnp.nan]), "x")
            debug.check_finite(jnp.ones(4), "x")  # finite -> no raise
        finally:
            debug.enable_nan_guard(False)

    def test_integer_leaves_ignored(self):
        import jax.numpy as jnp

        from alink_tpu.utils import debug

        debug.check_finite(jnp.arange(4), "ints", force=True)  # no raise


class TestDispatchProbe:
    """utils/dispatch.py — device_batch='auto' resolution."""

    def test_int_passthrough(self):
        from alink_tpu.utils.dispatch import resolve_device_batch

        assert resolve_device_batch(512) == 512

    def test_rejects_bad_values(self):
        import pytest as _pytest

        from alink_tpu.utils.dispatch import resolve_device_batch

        with _pytest.raises(ValueError):
            resolve_device_batch(0)
        with _pytest.raises(ValueError):
            resolve_device_batch("fastest")

    def test_auto_picks_by_latency(self):
        from alink_tpu.utils import dispatch

        assert dispatch.resolve_device_batch(
            "auto", probe=lambda: 1e-4) == dispatch.SMALL_CHUNK
        assert dispatch.resolve_device_batch(
            "auto", probe=lambda: 0.035) == dispatch.LARGE_CHUNK

    def test_real_probe_returns_sane_latency(self):
        from alink_tpu.utils.dispatch import measure_dispatch_latency

        lat = measure_dispatch_latency(iters=3)
        assert 0.0 < lat < 5.0

    def test_config_accepts_auto(self):
        import pytest as _pytest

        from alink_tpu.config import ALinkConfig

        assert ALinkConfig(device_batch="auto").device_batch == "auto"
        assert ALinkConfig(device_batch=256).device_batch == 256
        with _pytest.raises(ValueError):
            ALinkConfig(device_batch="turbo")
        with _pytest.raises(ValueError):
            ALinkConfig(device_batch=-1)
