"""Tests for mesh construction + sharded bulk ops (parallel/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.models import SiameseHead
from alink_tpu.parallel import (
    create_mesh,
    sharded_committee_probs,
    sharded_featurize,
    shard_batch,
)

# Full e2e layer: runs in the nightly/full suite (see pytest.ini tiers).
pytestmark = pytest.mark.slow


class TestMesh:
    def test_infer_shapes(self):
        assert create_mesh((-1,)).shape == {"data": 8, "model": 1}
        assert create_mesh((4, 2)).shape == {"data": 4, "model": 2}
        assert create_mesh((-1, 2)).shape == {"data": 4, "model": 2}

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh((3, 2))

    def test_shard_batch_pads(self, mesh8):
        tree = {"x": np.ones((5, 3), np.float32)}
        sharded, lengths = shard_batch(mesh8, tree)
        assert sharded["x"].shape == (8, 3)  # padded to data axis 4 -> 8
        assert lengths["x"] == 5


class TestShardedOps:
    def test_sharded_featurize_matches_local(self, mesh8):
        def featurize(x):
            return x.reshape(x.shape[0], -1) * 2.0

        images = jax.random.uniform(jax.random.PRNGKey(0), (13, 4, 4, 3))
        out = sharded_featurize(mesh8, featurize, images)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(featurize(images)), atol=1e-6)

    def test_sharded_face_pipeline_matches_local(self, mesh8):
        """detect->align->embed sharded over the mesh must equal the
        single-device pipeline (data-parallel serving fan-out)."""
        from alink_tpu.detect import (CascadeConfig, FaceModel,
                                      init_cascade_params)
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel import sharded_face_pipeline

        cfg = CascadeConfig(thresholds=(0.0, 0.0, 0.0),
                            stage1_scale_budget=8, stage1_budget=8,
                            stage2_budget=4, stage3_budget=2)
        embedder = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1),
                                    dtype=jnp.float32)
        eparams = embedder.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 112, 112, 3)))
        cparams = init_cascade_params(jax.random.PRNGKey(1))
        fm = FaceModel(eparams, cparams, cfg)
        fm.embedder = embedder
        images = jax.random.uniform(jax.random.PRNGKey(2), (9, 40, 40, 3),
                                    jnp.float32, 0.0, 255.0)
        got = sharded_face_pipeline(mesh8, fm, images)
        want = fm.pipeline(eparams, cparams, images)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    def test_arcface_tensor_parallel_matches_local(self, mesh8):
        """Megatron-split IR units over the model axis must equal the
        single-device forward (one psum per unit; parallel/tp.py)."""
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel.tp import arcface_tp_apply, tp_param_specs

        stage_sizes = (1, 1, 1, 1)
        model = ArcFaceResNet100(stage_sizes=stage_sizes,
                                 embedding_dim=32, dtype=jnp.float32)
        # 56x56 input keeps the CPU-mesh conv cost small; the topology
        # (strides, widths, head) is the production one.
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3), jnp.float32))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 56, 56, 3),
                               jnp.float32, 0.0, 255.0)
        want = model.apply(params, x)
        got = arcface_tp_apply(mesh8, params, x, stage_sizes=stage_sizes,
                               dtype=jnp.float32)
        assert got.shape == want.shape
        # Only the psum's cross-block summation order differs.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_arcface_tensor_parallel_non_divisible_widths(self):
        """Widths that do NOT divide the model axis run via the
        pad-and-mask path (_pad_unit_params) and still match the local
        forward exactly — 3 model ranks over widths 32/64/128/256."""
        from jax.sharding import Mesh

        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        from alink_tpu.parallel.tp import arcface_tp_apply

        mesh = Mesh(np.asarray(jax.devices()[:6]).reshape(2, 3),
                    (DATA_AXIS, MODEL_AXIS))
        stage_sizes = (1, 1, 1, 1)
        model = ArcFaceResNet100(stage_sizes=stage_sizes,
                                 stage_widths=(32, 64, 128, 256),
                                 embedding_dim=32, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3), jnp.float32))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 56, 56, 3),
                               jnp.float32, 0.0, 255.0)
        want = model.apply(params, x)
        got = arcface_tp_apply(mesh, params, x, stage_sizes=stage_sizes,
                               dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_arcface_pipeline_parallel_matches_local(self, mesh8):
        """2-rank GPipe schedule over the model axis (parallel/pp.py)
        must equal the single-device forward."""
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel.pp import arcface_pp_apply, boundary_shape

        stage_sizes = (1, 1, 1, 1)
        # Non-default widths: pp must read them from the caller, not
        # assume (64, 128, 256, 512) — a hardcoded-width regression
        # shows up as a cond branch shape mismatch here.
        stage_widths = (32, 64, 128, 256)
        model = ArcFaceResNet100(stage_sizes=stage_sizes,
                                 stage_widths=stage_widths,
                                 embedding_dim=16, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3), jnp.float32))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 112, 112, 3),
                               jnp.float32, 0.0, 255.0)
        want = model.apply(params, x)
        got = arcface_pp_apply(mesh8, params, x, stage_sizes=stage_sizes,
                               stage_widths=stage_widths,
                               microbatches=2, dtype=jnp.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        # Static boundary bookkeeping: unit 1 of this model ends at
        # 28x28x64.
        assert boundary_shape(1, 112, stage_sizes, stage_widths) \
            == (28, 64)

    def test_arcface_pipeline_parallel_4_ranks(self):
        """R-rank GPipe: 4 model ranks x 2 data shards, heterogeneous
        boundary shapes riding the packed envelope (parallel/pp.py)."""
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel import create_mesh
        from alink_tpu.parallel.pp import arcface_pp_apply

        mesh = create_mesh((2, 4))
        stage_sizes = (1, 2, 2, 1)
        stage_widths = (16, 32, 64, 128)
        model = ArcFaceResNet100(stage_sizes=stage_sizes,
                                 stage_widths=stage_widths,
                                 embedding_dim=16, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3),
                               jnp.float32, 0.0, 255.0)
        want = model.apply(params, x)
        # Default FLOP-balanced splits AND an explicit uneven split both
        # must match the local forward.
        for splits in (None, (0, 2, 4)):
            got = arcface_pp_apply(mesh, params, x,
                                   stage_sizes=stage_sizes,
                                   stage_widths=stage_widths,
                                   splits=splits, microbatches=2,
                                   dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)

    def test_pp_validation_errors(self, mesh8):
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel import create_mesh
        from alink_tpu.parallel.pp import arcface_pp_apply

        model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1),
                                 embedding_dim=16, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3), jnp.float32))
        x = jnp.zeros((8, 112, 112, 3), jnp.float32)
        with pytest.raises(ValueError, match="2 ranks"):
            arcface_pp_apply(create_mesh((8, 1)), params, x,
                             stage_sizes=(1, 1, 1, 1))
        with pytest.raises(ValueError, match="divide"):
            arcface_pp_apply(mesh8, params, x, stage_sizes=(1, 1, 1, 1),
                             microbatches=3)
        with pytest.raises(ValueError, match="both ranks"):
            arcface_pp_apply(mesh8, params, x, stage_sizes=(1, 1, 1, 1),
                             microbatches=2, split_after_unit=3)

    def test_tp_param_specs_shard_the_right_leaves(self):
        from alink_tpu.models import ArcFaceResNet100
        from alink_tpu.parallel.tp import tp_param_specs
        from jax.sharding import PartitionSpec as P

        model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1),
                                 embedding_dim=16, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3), jnp.float32))
        specs = tp_param_specs(params)
        unit = specs["params"]["_IRUnit_0"]
        assert unit["Conv_0"]["kernel"] == P(None, None, None, "model")
        assert unit["Conv_1"]["kernel"] == P(None, None, "model", None)
        assert unit["_FrozenBN_1"]["gamma"] == P("model")
        assert unit["_PReLU_0"]["alpha"] == P("model")
        # Full-channel pieces stay replicated.
        assert unit["_FrozenBN_0"]["gamma"] == P()
        assert unit["_FrozenBN_2"]["gamma"] == P()
        assert specs["params"]["Conv_0"]["kernel"] == P()
        assert specs["params"]["Dense_0"]["kernel"] == P()

    def test_sharded_committee_matches_vmap(self, mesh8):
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        d = 16
        params = [head.init(jax.random.PRNGKey(i), jnp.zeros((1, d)),
                            jnp.zeros((1, d))) for i in range(4)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        left = jax.random.normal(jax.random.PRNGKey(5), (9, d))
        right = jax.random.normal(jax.random.PRNGKey(6), (9, d))
        want = jnp.mean(
            jax.vmap(lambda p: head.apply(p, left, right))(stacked), axis=0)
        got = sharded_committee_probs(mesh8, head, stacked, left, right)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_committee_indivisible_raises(self, mesh8):
        head = SiameseHead(widths=(8, 4), dtype=jnp.float32)
        params = [head.init(jax.random.PRNGKey(i), jnp.zeros((1, 8)),
                            jnp.zeros((1, 8))) for i in range(3)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        with pytest.raises(ValueError):
            sharded_committee_probs(mesh8, head, stacked,
                                    jnp.zeros((2, 8)), jnp.zeros((2, 8)))


class TestFullDepthParallel:
    """TP/PP exactness at the REAL LResNet100 depth (VERDICT r3 #6).

    The toy-depth tests above prove the mechanics; these prove the
    production topology — stage_sizes (3, 13, 30, 3), 49 IR units —
    end to end against the local forward.  Widths are shrunk
    (8/16/32/64) so the 49-unit CPU forward stays tractable; depth,
    strides, split machinery, and envelope bookkeeping are the real
    thing.
    """

    FULL_DEPTH = (3, 13, 30, 3)
    WIDTHS = (8, 16, 32, 64)

    def _model_and_data(self, batch):
        from alink_tpu.models import ArcFaceResNet100

        model = ArcFaceResNet100(stage_sizes=self.FULL_DEPTH,
                                 stage_widths=self.WIDTHS,
                                 embedding_dim=8, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 112, 112, 3), jnp.float32))
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 112, 112, 3),
                               jnp.float32, 0.0, 255.0)
        return model, params, x

    def test_default_splits_full_depth_r8(self):
        """FLOP-balanced splits at R=8 over the real 49-unit topology:
        7 strictly ascending indices, >=1 unit per segment, and no
        segment above ~2x the ideal FLOP share (parallel/pp.py:63-84)."""
        from alink_tpu.parallel.pp import _default_splits
        from alink_tpu.parallel.tp import _unit_strides

        strides = _unit_strides(self.FULL_DEPTH)
        widths = [w for blocks, w in zip(self.FULL_DEPTH, (64, 128, 256, 512))
                  for _ in range(blocks)]
        splits = _default_splits(8, strides, widths, 112)
        assert len(splits) == 7
        assert list(splits) == sorted(set(splits))
        assert all(0 <= s < len(strides) - 1 for s in splits)
        # Segment FLOP balance: recompute the per-unit costs the splitter
        # uses and bound the worst segment.
        hw, costs = 112, []
        for s, w in zip(strides, widths):
            hw //= s
            costs.append(hw * hw * w * w)
        bounds = (0,) + tuple(s + 1 for s in splits) + (len(costs),)
        seg = [sum(costs[a:b]) for a, b in zip(bounds, bounds[1:])]
        assert min(seg) > 0
        assert max(seg) <= 2.0 * sum(costs) / 8

    def test_arcface_tp_full_depth_matches_local(self, mesh8):
        """Megatron TP through all 49 units equals the local forward
        (parallel/tp.py at production depth)."""
        from alink_tpu.parallel.tp import arcface_tp_apply

        model, params, x = self._model_and_data(batch=8)
        want = model.apply(params, x)
        got = arcface_tp_apply(mesh8, params, x,
                               stage_sizes=self.FULL_DEPTH,
                               dtype=jnp.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)

    def test_arcface_pp_full_depth_r8(self):
        """GPipe at R=8 model ranks through all 49 units with the
        default FLOP-balanced splits equals the local forward — the
        _default_splits path at R>4 (parallel/pp.py:63-84) plus the
        packed-envelope machinery across 7 heterogeneous boundaries."""
        from alink_tpu.parallel import create_mesh
        from alink_tpu.parallel.pp import arcface_pp_apply

        mesh = create_mesh((1, 8))
        model, params, x = self._model_and_data(batch=4)
        want = model.apply(params, x)
        got = arcface_pp_apply(mesh, params, x,
                               stage_sizes=self.FULL_DEPTH,
                               stage_widths=self.WIDTHS,
                               microbatches=2, dtype=jnp.float32)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)


class TestDistributed:
    """Multi-host layer (single-process degenerate paths are exact)."""

    def test_initialize_noop_single_process(self):
        from alink_tpu.parallel import initialize

        initialize()  # must not raise or try to reach a coordinator
        initialize(num_processes=1)

    def test_multihost_mesh_axes_and_order(self):
        from alink_tpu.parallel import (DATA_AXIS, MODEL_AXIS,
                                        create_multihost_mesh)

        mesh = create_multihost_mesh(model=2)
        assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
        assert mesh.shape[MODEL_AXIS] == 2
        assert mesh.shape[DATA_AXIS] == len(jax.devices()) // 2

    def test_multihost_mesh_rejects_model_across_hosts(self):
        from alink_tpu.parallel import create_multihost_mesh

        with pytest.raises(ValueError):
            create_multihost_mesh(model=len(jax.devices()) * 2)

    def test_global_batch_from_local_shards_rows(self):
        from alink_tpu.parallel import (create_multihost_mesh,
                                        global_batch_from_local)

        mesh = create_multihost_mesh()
        local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
        arr = global_batch_from_local(mesh, local)
        assert arr.shape == (16, 3)
        np.testing.assert_array_equal(np.asarray(arr), local)
        # Batch axis is spread over the data axis of the mesh.
        assert len(arr.sharding.device_set) == len(jax.devices())

    def test_process_shard_covers_dataset(self):
        from alink_tpu.parallel import process_shard

        s = process_shard(103)
        np.testing.assert_array_equal(s, np.arange(103))  # 1 process


class TestElasticRestart:
    """SURVEY.md section 5.3, elastic recovery: a loop checkpoint written
    while featurizing over the full mesh must resume EXACTLY under a
    smaller mesh (the supervised-restart path after losing devices:
    create_mesh((-1,)) re-infers the data axis from whatever survives,
    and checkpoints carry no device layout)."""

    def _make_loop(self, mesh):
        from alink_tpu import train as T
        from alink_tpu.active import ALinkLoop, Committee
        from alink_tpu.config import ALinkConfig
        from alink_tpu.data import PersonStacks

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

        def featurize(imgs):
            return sharded_featurize(
                mesh, lambda x: x.reshape(x.shape[0], -1), imgs)

        def replay():
            rng = np.random.default_rng(3)
            while True:
                left = rng.random((8, d)).astype(np.float32)
                right = rng.random((8, d)).astype(np.float32)
                yield (left, right), (rng.random(8) > 0.5).astype(np.int32)

        loop = ALinkLoop(cfg, featurize=featurize, committee=com,
                         m2_state=m2, replay_gen=replay(),
                         key=jax.random.PRNGKey(4))
        rng = np.random.default_rng(5)
        people = 6
        plain = PersonStacks(
            rng.random((people, 2, size, size, 3)).astype(np.float32) * 255,
            np.full(people, 2, np.int32))
        dig = PersonStacks(
            rng.random((people, 2, size, size, 3)).astype(np.float32) * 255,
            np.full(people, 2, np.int32))
        return loop, plain, dig

    def test_checkpoint_resumes_under_smaller_mesh(self, mesh8, tmp_path):
        # Ground truth: uninterrupted run, all 8 devices.
        loop_a, plain, dig = self._make_loop(mesh8)
        with jax.set_mesh(mesh8):
            state_a = loop_a.run(plain, dig,
                                 checkpoint_path=str(tmp_path / "gt"))

        # Interrupted run on the full mesh: one slab, then "crash".
        path = str(tmp_path / "elastic")
        loop_b, _, _ = self._make_loop(mesh8)
        with jax.set_mesh(mesh8):
            loop_b.run_iteration(plain.take_people([0, 1]),
                                 dig.take_people([0, 1]))
        loop_b.state.pool_cursor = loop_b.config.alink_bs
        loop_b.save(path)
        del loop_b

        # Restart with half the devices gone: 4-device mesh, exact resume.
        mesh4 = create_mesh((-1,), devices=jax.devices()[:4])
        loop_c, _, _ = self._make_loop(mesh4)
        with jax.set_mesh(mesh4):
            state_c = loop_c.run(plain, dig, checkpoint_path=path)

        assert state_c.active_count == state_a.active_count
        assert state_c.un_size == state_a.un_size
        assert state_c.pool_cursor == state_a.pool_cursor
        for a, c in zip(jax.tree.leaves(state_a.m2_state.params),
                        jax.tree.leaves(state_c.m2_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-6)
