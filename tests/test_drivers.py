"""End-to-end driver tests on synthetic datasets (drivers/ vs code/ALINK*.py).

These are the integration tests the reference never had (SURVEY.md section
4): each driver runs its complete staging + loop on a synthetic
DFW/MTP-shaped dataset with a cheap injected featurizer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.config import ALinkArcConfig, ALinkConfig, ExistingALConfig, MTPConfig
from alink_tpu.data import make_synthetic_dfw, make_synthetic_mtp
from alink_tpu.drivers.alink import parse_config, run_alink
from alink_tpu.drivers.alink_mtp import run_alink_mtp
from alink_tpu.drivers.existing_al import run_existing_al
from alink_tpu.drivers import visualize_noise

# Full e2e layer: runs in the nightly/full suite (see pytest.ini tiers).
pytestmark = pytest.mark.slow


SIZE = 12
FDIM = SIZE * SIZE * 3


def _flatten_featurize(images):
    return images.reshape(images.shape[0], -1) / 255.0


@pytest.fixture(scope="module")
def dfw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dfw_driver"))
    return make_synthetic_dfw(root, num_people=4, plain_per_person=2,
                              disguised_per_person=4, impostors_per_person=2,
                              image_size=SIZE)


class TestFlagParsing:
    def test_defaults_match_reference(self):
        cfg = parse_config([])
        assert cfg.batch_size == 16
        assert cfg.eps == 0.05
        assert cfg.noise == ("gaussian", "saltpepper", "poisson", "speckle",
                             "adversarial")

    def test_overrides(self):
        cfg = parse_config(["--noise", "gaussian,perlin", "--eps", "0.1",
                            "--blind_strategy", "true", "--alink_bs", "4"])
        assert cfg.noise == ("gaussian", "perlin")
        assert cfg.eps == 0.1
        assert cfg.blind_strategy is True
        assert cfg.alink_bs == 4

    def test_arc_defaults(self):
        cfg = parse_config([], config_cls=ALinkArcConfig)
        assert cfg.image_res == (112, 112)
        assert cfg.feature_res == 512
        assert "perlin" in cfg.noise

    def test_validation(self):
        with pytest.raises(ValueError):
            parse_config(["--eps", "0.7"])

    def test_device_batch_int_or_auto(self):
        # int|str fields dispatch on the declared annotation (review
        # fix): ints parse as ints, the "auto" keyword survives as str.
        assert parse_config(["--device_batch", "auto"]).device_batch == "auto"
        assert parse_config(["--device_batch", "128"]).device_batch == 128

    def test_embed_depth_validated(self):
        cfg = parse_config(["--embed_depth", "50"],
                           config_cls=ALinkArcConfig)
        assert cfg.embed_depth == 50
        with pytest.raises(ValueError, match="embed_depth"):
            parse_config(["--embed_depth", "18"],
                         config_cls=ALinkArcConfig)


class TestALinkDriver:
    def test_end_to_end(self, dfw_root, tmp_path):
        cfg = parse_config(
            [],
            data_dir_prefix=dfw_root,
            out_model=os.path.join(str(tmp_path), "post"),
            ensemble_basepath=os.path.join(str(tmp_path), "ens"),
            disguised_basemodel=os.path.join(str(tmp_path), "dig"),
            noise=("gaussian", "speckle"),
            image_res=(SIZE, SIZE),
            feature_res=FDIM,
            dig_epochs=1,
            undig_epochs=1,
            ft_epochs=1,
            alink_bs=2,
            batch_send=4,
            batch_size=8,
            disparity_ratio=0.9,
            eps=0.01,
        )
        state = run_alink(cfg, featurize=_flatten_featurize, n_steps=32)
        assert state.un_size > 0
        assert os.path.isdir(cfg.out_model)
        # Staged models were saved for train-or-load reuse.
        assert os.path.isdir(cfg.disguised_basemodel)
        assert os.path.isdir(f"{cfg.ensemble_basepath}1")

    def test_synthetic_demo_mode(self, tmp_path):
        """--synthetic_people fabricates the dataset and runs everything
        (no DFW download needed to exercise the complete system)."""
        cfg = parse_config(
            [],
            synthetic_people=3,
            out_model=os.path.join(str(tmp_path), "post"),
            ensemble_basepath=os.path.join(str(tmp_path), "ens"),
            disguised_basemodel=os.path.join(str(tmp_path), "dig"),
            noise=("gaussian",),
            image_res=(SIZE, SIZE),
            feature_res=FDIM,
            dig_epochs=1, undig_epochs=1, ft_epochs=1,
            alink_bs=2, batch_send=4, batch_size=8,
            active_ratio=0.0,  # stop after one slab
        )
        state = run_alink(cfg, featurize=_flatten_featurize, n_steps=16)
        assert state.un_size > 0
        assert os.path.isdir(cfg.out_model)

    def test_max_restarts_requires_checkpoint(self):
        # Validated at CONFIG time — a misconfigured run must not stage
        # data and pretrain for hours before discovering it.
        with pytest.raises(ValueError, match="loop_checkpoint"):
            parse_config([], max_restarts=2)

    def test_supervised_restart_completes(self, dfw_root, tmp_path,
                                          monkeypatch):
        """max_restarts + loop_checkpoint: an injected device fault on
        the first attempt is survived; the rebuilt loop resumes from the
        checkpoint and the run completes (SURVEY.md section 5.3)."""
        from alink_tpu.active.loop import ALinkLoop

        orig = ALinkLoop.run_iteration
        calls = {"n": 0}

        def flaky(self, *args, **kwargs):
            calls["n"] += 1
            if calls["n"] == 2:  # after the first checkpointed slab
                raise RuntimeError("injected device halt")
            return orig(self, *args, **kwargs)

        monkeypatch.setattr(ALinkLoop, "run_iteration", flaky)
        cfg = parse_config(
            [],
            data_dir_prefix=dfw_root,
            out_model=os.path.join(str(tmp_path), "post"),
            ensemble_basepath=os.path.join(str(tmp_path), "ens"),
            disguised_basemodel=os.path.join(str(tmp_path), "dig"),
            noise=("gaussian",),
            image_res=(SIZE, SIZE), feature_res=FDIM,
            dig_epochs=1, undig_epochs=1, ft_epochs=1,
            alink_bs=2, batch_send=4, batch_size=8,
            disparity_ratio=0.9, eps=0.01,
            loop_checkpoint=os.path.join(str(tmp_path), "loop_ck"),
            max_restarts=2,
        )
        state = run_alink(cfg, featurize=_flatten_featurize, n_steps=16)
        assert calls["n"] >= 3  # failed attempt + resumed completion
        assert state.un_size > 0
        assert os.path.isdir(cfg.out_model)

    def test_reload_skips_training(self, dfw_root, tmp_path):
        """Second run must load the staged models (maybeLoadFromMemory)."""
        kwargs = dict(
            data_dir_prefix=dfw_root,
            out_model=os.path.join(str(tmp_path), "post"),
            ensemble_basepath=os.path.join(str(tmp_path), "ens"),
            disguised_basemodel=os.path.join(str(tmp_path), "dig"),
            noise=("gaussian",),
            image_res=(SIZE, SIZE),
            feature_res=FDIM,
            dig_epochs=1, undig_epochs=1, ft_epochs=1,
            alink_bs=2, batch_send=4, batch_size=8,
            active_ratio=0.0,  # stop after one slab
        )
        cfg = parse_config([], **kwargs)
        run_alink(cfg, featurize=_flatten_featurize, n_steps=16)
        state2 = run_alink(cfg, featurize=_flatten_featurize, n_steps=16)
        assert state2.un_size > 0


class TestMTPDriver:
    def test_end_to_end(self, tmp_path):
        train_dir = str(tmp_path / "train")
        test_dir = str(tmp_path / "test")
        make_synthetic_mtp(train_dir, num_subjects=4, image_size=SIZE)
        make_synthetic_mtp(test_dir, num_subjects=3, image_size=SIZE, seed=9)
        cfg = parse_config(
            [],
            config_cls=MTPConfig,
            data_dir_prefix=train_dir,
            test_dir=test_dir,
            out_model=str(tmp_path / "post"),
            ensemble_basepath=str(tmp_path / "ens"),
            lowres_basemodel=str(tmp_path / "low"),
            noise=("gaussian",),  # adversarial DE is too slow for CI
            image_res=(SIZE, SIZE),
            normal_res=(SIZE, SIZE),
            feature_res=FDIM,
            low_res=12,  # SmallRes needs >= 12px for its conv/pool chain
            lowres_epochs=1,
            highres_epochs=1,
            ft_epochs=1,
            alink_bs=2,
            batch_send=4,
            batch_size=8,
        )
        state, top1 = run_alink_mtp(cfg, featurize=_flatten_featurize,
                                    n_steps=16)
        assert state.un_size > 0
        assert top1 is not None
        assert 0.0 <= top1 <= 1.0


class TestExistingALDriver:
    def test_end_to_end(self, dfw_root, tmp_path):
        cfg = parse_config(
            [],
            config_cls=ExistingALConfig,
            data_dir_prefix=dfw_root,
            model_path=str(tmp_path / "active"),
            out_model=str(tmp_path / "post_active"),
            image_res=(SIZE, SIZE),
            feature_res=FDIM,
            epochs=1,
            batch_size=16,
        )
        learner = run_existing_al(cfg, featurize=_flatten_featurize,
                                  n_rounds=3, n_steps=32)
        assert learner._y is not None and len(learner._y) > 0
        assert os.path.isdir(cfg.out_model)


class TestVisualizeNoise:
    def test_writes_image(self, tmp_path):
        from PIL import Image

        src = str(tmp_path / "in.png")
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (56, 56, 3),
                                              dtype=np.uint8)
        ).save(src)
        out = str(tmp_path / "out.png")
        visualize_noise.main(["--image", src, "--noise", "perlin",
                              "--out", out])
        assert os.path.exists(out)


class TestExistingALMTPDriver:
    def test_end_to_end(self, tmp_path):
        from alink_tpu.drivers.existing_al_mtp import run_existing_al_mtp
        from alink_tpu.config import MTPConfig
        from alink_tpu.data import make_synthetic_mtp

        train_dir = str(tmp_path / "train")
        make_synthetic_mtp(train_dir, num_subjects=4, image_size=SIZE)
        cfg = parse_config(
            [],
            config_cls=MTPConfig,
            data_dir_prefix=train_dir,
            out_model=str(tmp_path / "post"),
            lowres_basemodel=str(tmp_path / "low"),
            image_res=(SIZE, SIZE),
            normal_res=(SIZE, SIZE),
            low_res=12,
            lowres_epochs=1,
            ft_epochs=1,
            batch_size=8,
        )
        learner = run_existing_al_mtp(cfg, n_rounds=2, n_steps=16)
        assert learner._y is not None and len(learner._y) > 0


class TestCommitteeStaging:
    def test_train_then_reload(self, tmp_path):
        from alink_tpu.drivers.common import train_or_load_committee

        rng = np.random.default_rng(0)
        d = 16

        def gen():
            while True:
                l = rng.normal(size=(8, d)).astype(np.float32)
                r = rng.normal(size=(8, d)).astype(np.float32)
                yield (l, r), (rng.random(8) > 0.5).astype(np.int32)

        base = str(tmp_path / "ens")
        com1, _ = train_or_load_committee(
            jax.random.PRNGKey(0), d, ("gaussian",), 2, base, gen(),
            epochs=1, batch_size=8, n_steps=16,
        )
        assert com1.num_members == 2
        assert os.path.isdir(base + "1") and os.path.isdir(base + "2")
        # Second call restores without training.
        com2, _ = train_or_load_committee(
            jax.random.PRNGKey(9), d, ("gaussian",), 2, base, gen(),
            epochs=1, batch_size=8, n_steps=16,
        )
        a = jax.tree.leaves(com1.params)
        b = jax.tree.leaves(com2.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)

    def test_partial_checkpoints_keep_restored_members(self, tmp_path):
        """A save loop interrupted after member 1 must not discard that
        member's checkpoint: on rerun, member 1 keeps its saved params
        (reference trains-or-loads per member, ALINK.py:122-132) and only
        the missing member is (re)trained."""
        import shutil

        from alink_tpu.active.committee import unstack_params
        from alink_tpu.drivers.common import train_or_load_committee

        rng = np.random.default_rng(1)
        d = 16

        def gen():
            while True:
                l = rng.normal(size=(8, d)).astype(np.float32)
                r = rng.normal(size=(8, d)).astype(np.float32)
                yield (l, r), (rng.random(8) > 0.5).astype(np.int32)

        base = str(tmp_path / "ens")
        com1, _ = train_or_load_committee(
            jax.random.PRNGKey(0), d, ("gaussian",), 2, base, gen(),
            epochs=1, batch_size=8, n_steps=16,
        )
        member1 = unstack_params(com1.params, 0)
        shutil.rmtree(base + "2")  # simulate interrupted save loop
        com2, _ = train_or_load_committee(
            jax.random.PRNGKey(7), d, ("gaussian",), 2, base, gen(),
            epochs=1, batch_size=8, n_steps=16,
        )
        for x, y in zip(jax.tree.leaves(member1),
                        jax.tree.leaves(unstack_params(com2.params, 0))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
        assert os.path.isdir(base + "2")  # missing member re-saved
