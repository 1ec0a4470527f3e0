"""Tests for the utilities-chain CLI tools (tools/ vs utilities/*)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu import train as T
from alink_tpu.data import make_synthetic_mtp
from alink_tpu.models import SiameseHead
from alink_tpu.tools import (
    generate_matrix,
    generate_predictions as gp,
    get_stats,
    mtp_staging,
    plots,
    roc_precompute,
)


class TestPredictionChain:
    """The generatePredictions -> generateMatrix -> ROC -> stats chain
    (SURVEY.md section 3.5) end to end on synthetic artifacts."""

    @pytest.fixture(scope="class")
    def chain_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("chain")
        n, dim = 24, 32
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(n, dim)).astype(np.float32)
        np.save(d / "processedData.npy", feats)
        head = SiameseHead()
        params = head.init(jax.random.PRNGKey(0),
                           np.zeros((1, dim), np.float32),
                           np.zeros((1, dim), np.float32))
        T.save(str(d / "head_ckpt"), params)
        mask = np.zeros((n, n), int)
        iu = np.triu_indices(n, 1)
        mask[iu] = rng.integers(1, 5, len(iu[0]))
        np.savetxt(d / "mask.txt", mask, fmt="%d")
        return d

    def test_generate_matrix(self, chain_dir):
        out = str(chain_dir / "scores.npy")
        generate_matrix.main([
            str(chain_dir / "head_ckpt"), out,
            "--features", str(chain_dir / "processedData.npy"),
        ])
        scores = np.load(out)
        assert scores.shape == (24, 24)
        assert np.all((scores >= 0) & (scores <= 1))

    def test_roc_and_stats(self, chain_dir, capsys):
        scores_path = str(chain_dir / "scores.npy")
        if not os.path.exists(scores_path):
            self.test_generate_matrix(chain_dir)
        tprfpr = str(chain_dir / "tpr_fpr.txt")
        roc_precompute.main([
            scores_path, tprfpr, "3", "--mask", str(chain_dir / "mask.txt"),
        ])
        assert os.path.exists(tprfpr)
        get_stats.main([tprfpr])
        out = capsys.readouterr().out
        assert "AUC" in out and "EER" in out and "GAR" in out

    def test_plots(self, chain_dir):
        scores_path = str(chain_dir / "scores.npy")
        if not os.path.exists(scores_path):
            self.test_generate_matrix(chain_dir)
        tprfpr = str(chain_dir / "tpr_fpr.txt")
        if not os.path.exists(tprfpr):
            roc_precompute.main([scores_path, tprfpr, "3",
                                 "--mask", str(chain_dir / "mask.txt")])
        roc_out = str(chain_dir / "roc.png")
        plots.main(["roc", tprfpr, roc_out])
        hist_out = str(chain_dir / "hist.png")
        plots.main(["histogram", scores_path, str(chain_dir / "mask.txt"),
                    hist_out])
        assert os.path.exists(roc_out) or os.path.exists(roc_out + ".npz")
        assert os.path.exists(hist_out) or os.path.exists(hist_out + ".npz")


class TestGeneratePredictionsFn:
    def test_batched_featurize(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        names = []
        for i in range(5):
            name = f"face_{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (20, 20, 3),
                                         dtype=np.uint8)).save(
                tmp_path / name)
            names.append(name)
        feats = gp.generate_predictions(
            str(tmp_path), names,
            lambda x: x.reshape(x.shape[0], -1)[:, :8],
            image_res=(16, 16), batch=2,
        )
        assert feats.shape == (5, 8)

    def test_missing_image_fails_loudly(self, tmp_path):
        """The ROC masks are positional: a silently skipped image would
        shift every label after it, so missing files must raise."""
        from PIL import Image

        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "a.jpg")
        with pytest.raises(FileNotFoundError, match="positional"):
            gp.generate_predictions(
                str(tmp_path), ["a.jpg", "nope.jpg"],
                lambda x: x.reshape(x.shape[0], -1)[:, :4],
                image_res=(8, 8))


class TestDFWCrop:
    def test_delete_bad_only_removes_unreadable(self, tmp_path):
        """--delete_bad must never remove a readable image whose failure
        is elsewhere (missing box entry); and a save failure propagates
        instead of deleting the source (reference deletes only images
        that fail to OPEN, readDFW.py:40-43)."""
        from PIL import Image

        from alink_tpu.tools import dfw_crop

        d = tmp_path / "Training_data" / "p1"
        d.mkdir(parents=True)
        good = d / "ok.jpg"
        Image.fromarray(np.full((10, 10, 3), 128, np.uint8)).save(good)
        bad = d / "corrupt.jpg"
        bad.write_bytes(b"\xff\xd8not a real jpeg")
        boxes = {os.path.join("Training_data", "p1", "ok.jpg"):
                 (1, 1, 8, 8)}
        # corrupt.jpg: unreadable AND has no box entry -> it is counted
        # but NOT a delete candidate via the no-box path; ok.jpg crops.
        problems = dfw_crop.crop_images(
            str(tmp_path), os.path.join("Training_data", "p1"), boxes,
            out_prefix=str(tmp_path / "out"), delete_bad=True)
        assert problems == 1
        assert good.exists()          # readable source untouched
        assert bad.exists()           # no box entry -> never deleted
        # Now give the corrupt file a box entry: it becomes a genuine
        # unreadable-image failure and delete_bad removes it.
        boxes[os.path.join("Training_data", "p1", "corrupt.jpg")] = (
            1, 1, 8, 8)
        problems = dfw_crop.crop_images(
            str(tmp_path), os.path.join("Training_data", "p1"), boxes,
            out_prefix=str(tmp_path / "out"), delete_bad=True)
        assert problems == 1
        assert not bad.exists()
        assert good.exists()


class TestMTPStaging:
    def test_group_bisect_dirs(self, tmp_path):
        raw = tmp_path / "raw"
        make_synthetic_mtp(str(raw), num_subjects=4, image_size=8)
        seg = tmp_path / "seg"
        mtp_staging.group_by_person(str(raw), str(seg), move=False)
        people = sorted(os.listdir(seg))
        assert len(people) == 4
        assert all(len(os.listdir(seg / p)) == 5 for p in people)

        lists = tmp_path / "lists"
        splits = mtp_staging.bisect_into_paths(str(seg), str(lists))
        total = sum(len(v) for v in splits.values())
        assert total == 20
        for fname in ("unlabelledData.txt", "testData.txt",
                      "highResData.txt", "lowResData.txt"):
            assert os.path.exists(lists / fname)

    def test_ready_data_pipeline(self, tmp_path):
        raw = tmp_path / "raw"
        make_synthetic_mtp(str(raw), num_subjects=5, image_size=8)
        out = tmp_path / "out"
        mtp_staging.ready_data(str(raw), str(out))
        for res in ("highres", "lowres"):
            for split in ("train", "val"):
                path = out / res / split
                assert path.is_dir()
        # Staged person dirs hold the person's own images.
        hr_train = out / "highres" / "train"
        for person in os.listdir(hr_train):
            for f in os.listdir(hr_train / person):
                assert f.split("_")[0] == person


class TestWeightConversion:
    def _write_keras_h5(self, path, dims=(32, 512, 64, 2)):
        """Emit a Keras-2 save_weights-layout HDF5 for a 3-Dense model."""
        import h5py

        rng = np.random.default_rng(0)
        layer_names = []
        with h5py.File(path, "w") as f:
            for i in range(3):
                name = f"dense_{i + 1}"
                layer_names.append(name.encode())
                g = f.create_group(name)
                k = rng.normal(size=(dims[i], dims[i + 1])).astype(np.float32)
                b = rng.normal(size=(dims[i + 1],)).astype(np.float32)
                g.create_dataset(f"{name}/kernel:0", data=k)
                g.create_dataset(f"{name}/bias:0", data=b)
                g.attrs["weight_names"] = [
                    f"{name}/kernel:0".encode(), f"{name}/bias:0".encode()]
            # Keras also writes non-weight layers (inputs, lambda, softmax).
            for extra in ("input_1", "lambda_1", "activation_1"):
                g = f.create_group(extra)
                g.attrs["weight_names"] = []
                layer_names.append(extra.encode())
            f.attrs["layer_names"] = layer_names
        return path

    def test_siamese_h5_roundtrip(self, tmp_path):
        from alink_tpu.models import SiameseHead
        from alink_tpu.tools.convert_weights import siamese_h5_to_params

        h5 = self._write_keras_h5(str(tmp_path / "disguisedModel.h5"))
        params = siamese_h5_to_params(h5)
        head = SiameseHead(dtype=jnp.float32)
        # The converted tree must drive the real head (and the fused
        # pairwise engine) without modification.
        left = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 32)).astype(np.float32))
        probs = head.apply(params, left, left)
        assert probs.shape == (4, 2)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
        from alink_tpu.ops.pairwise import score_matrix_xla

        m = score_matrix_xla(params, left, left)
        assert m.shape == (4, 4)

    def test_cli_writes_checkpoint(self, tmp_path):
        from alink_tpu.tools import convert_weights
        from alink_tpu import train as T

        h5 = self._write_keras_h5(str(tmp_path / "m.h5"))
        out = str(tmp_path / "ckpt")
        convert_weights.main(["siamese", h5, out])
        restored = T.restore(out)
        assert restored["params"]["hidden_0"]["kernel"].shape == (32, 512)

    def test_wrong_layer_count_raises(self, tmp_path):
        import h5py
        from alink_tpu.tools.convert_weights import siamese_h5_to_params

        path = str(tmp_path / "bad.h5")
        with h5py.File(path, "w") as f:
            f.attrs["layer_names"] = [b"dense_1"]
            g = f.create_group("dense_1")
            g.create_dataset("dense_1/kernel:0", data=np.zeros((2, 2)))
            g.create_dataset("dense_1/bias:0", data=np.zeros((2,)))
            g.attrs["weight_names"] = [b"dense_1/kernel:0",
                                       b"dense_1/bias:0"]
        with pytest.raises(ValueError):
            siamese_h5_to_params(path)


class TestEvaluateOneShot:
    def test_full_chain_matches_piecewise(self, tmp_path, capsys):
        """tools/evaluate must reproduce the 4-step reference chain's
        numbers exactly from the same features/mask."""
        from alink_tpu.tools import evaluate

        n, dim = 20, 16
        rng = np.random.default_rng(3)
        feats = rng.normal(size=(n, dim)).astype(np.float32)
        np.save(tmp_path / "feats.npy", feats)
        head = SiameseHead()
        params = head.init(jax.random.PRNGKey(1),
                           np.zeros((1, dim), np.float32),
                           np.zeros((1, dim), np.float32))
        T.save(str(tmp_path / "ckpt"), params)
        mask = np.zeros((n, n), int)
        iu = np.triu_indices(n, 1)
        mask[iu] = rng.integers(1, 5, len(iu[0]))
        np.savetxt(tmp_path / "mask.txt", mask, fmt="%d")

        evaluate.main([
            "--model_ckpt", str(tmp_path / "ckpt"),
            "--mask", str(tmp_path / "mask.txt"),
            "--features", str(tmp_path / "feats.npy"),
            "--roc_case", "0",
            "--save_matrix", str(tmp_path / "scores.npy"),
            "--save_tprfpr", str(tmp_path / "tprfpr.txt"),
        ])
        out = capsys.readouterr().out
        import json as _json
        jsons = [_json.loads(line) for line in out.splitlines()
                 if line.startswith("{")]
        assert [j["case"] for j in jsons] == [
            "impersonation", "obfuscation", "overall"]

        # Cross-check against the piecewise tools on the saved matrix.
        from alink_tpu.evaluation import roc_stats
        tprfpr = str(tmp_path / "piece.txt")
        roc_precompute.main([
            str(tmp_path / "scores.npy"), tprfpr, "3",
            "--mask", str(tmp_path / "mask.txt"),
        ])
        tpr, fpr = np.loadtxt(tprfpr)
        want = roc_stats(tpr, fpr)
        got = jsons[2]
        np.testing.assert_allclose(got["auc"], want.auc, atol=1e-6)
        np.testing.assert_allclose(got["eer"], want.eer, atol=1e-6)
        # Per-case tprfpr files were suffixed.
        assert (tmp_path / "tprfpr_overall.txt").exists()

    def test_requires_exactly_one_source(self, tmp_path):
        from alink_tpu.tools import evaluate
        with pytest.raises(SystemExit):
            evaluate.main(["--model_ckpt", "x", "--mask", "y"])


class TestCalibrateBudgets:
    def test_profile_and_recommend_structure(self):
        """profile_cascade counts respect budgets; recommend() is
        monotone along the cascade and flags saturated profiling runs."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from alink_tpu.detect import CascadeConfig, init_cascade_params
        from alink_tpu.detect.cascade import profile_cascade
        from alink_tpu.tools.calibrate_budgets import recommend

        cfg = CascadeConfig.worst_case(min_size=40,
                                       thresholds=(0.0, 0.0, 0.0))
        params = init_cascade_params(jax.random.PRNGKey(1))
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (3, 64, 64, 3),
                                  jnp.float32, 0.0, 255.0)
        prof = profile_cascade(params, imgs, cfg)
        assert set(prof) == {"scale_raw_max", "stage1", "stage2", "stage3"}
        assert all(v.shape == (3,) for v in prof.values())
        assert int(np.max(np.asarray(prof["stage1"]))) <= cfg.stage1_budget
        # Survivors can only shrink along the cascade.
        assert np.all(np.asarray(prof["stage2"])
                      <= np.asarray(prof["stage1"]))
        assert np.all(np.asarray(prof["stage3"])
                      <= np.asarray(prof["stage2"]))

        rec, warnings = recommend(prof, cfg, quantile=0.99, headroom=2.0)
        assert rec["stage2_budget"] <= rec["stage1_budget"]
        assert rec["stage3_budget"] <= rec["stage2_budget"]
        assert warnings == []

        # Saturation: a fake profile pinned at the budget must warn.
        fake = dict(prof)
        fake["stage2"] = jnp.full((3,), cfg.stage2_budget)
        _, warns = recommend(fake, cfg, quantile=0.99, headroom=2.0)
        assert any("stage2" in w for w in warns)

    def test_cli_synthetic_smoke(self, capsys):
        from alink_tpu.tools.calibrate_budgets import main
        main(["--sample", "2", "--image_res", "64",
              "--thresholds", "0.0", "0.0", "0.0"])
        out = capsys.readouterr().out
        assert "Recommended config" in out
        assert "stage1_scale_budget" in out
