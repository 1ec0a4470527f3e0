"""Model-zoo shape/semantics tests (reference parity noted per test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.models import (
    ArcFaceResNet100,
    ONet,
    PNet,
    RNet,
    LNet,
    SiameseHead,
    SmallRes,
    VGGFaceResNet50,
    preprocess,
)


def test_siamese_head_softmax_shapes(rng):
    # code/siamese.py:19-35 — (features, features) -> 2-class softmax.
    model = SiameseHead()
    left = jnp.ones((4, 2048))
    right = jnp.zeros((4, 2048))
    params = model.init(rng, left, right)
    probs = model.apply(params, left, right)
    assert probs.shape == (4, 2)
    np.testing.assert_allclose(np.sum(probs, axis=-1), 1.0, rtol=1e-5)


def test_siamese_head_symmetric_in_pair_order(rng):
    # |l - r| symmetry: swapping the pair cannot change the score.
    model = SiameseHead()
    l = jax.random.normal(rng, (3, 64))
    r = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    params = model.init(rng, l, r)
    np.testing.assert_allclose(
        model.apply(params, l, r), model.apply(params, r, l), rtol=1e-5
    )


def test_siamese_head_sigmoid_variant(rng):
    # code/siamese3.py — Dense(1)+sigmoid, exported in 2-class convention.
    model = SiameseHead(head="sigmoid")
    l = jnp.ones((2, 32))
    r = jnp.zeros((2, 32))
    params = model.init(rng, l, r)
    probs = model.apply(params, l, r)
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(np.sum(probs, axis=-1), 1.0, rtol=1e-5)


def test_siamese_logits_match_probs(rng):
    model = SiameseHead(widths=(16, 8))
    l = jax.random.normal(rng, (5, 12))
    r = jax.random.normal(jax.random.PRNGKey(2), (5, 12))
    params = model.init(rng, l, r)
    probs = model.apply(params, l, r)
    logits = model.apply(params, l, r, method=SiameseHead.logits)
    np.testing.assert_allclose(jax.nn.softmax(logits, axis=-1), probs, rtol=1e-5)


def test_smallres_towers_share_weights(rng):
    # code/siamese.py:158-161 — the twin towers are the same network.
    model = SmallRes(feature_dim=32)
    x = jax.random.normal(rng, (2, 48, 48, 3))
    params = model.init(rng, x, x)
    probs = model.apply(params, x, x)
    # Identical inputs through shared towers -> |l-r| = 0 -> constant rows.
    np.testing.assert_allclose(probs[0], probs[1], rtol=1e-4)
    assert probs.shape == (2, 2)


def test_resnet50_feature_dim(rng):
    # code/siamese.py:203-209 — 2048-d avg_pool feature at 224x224.
    model = VGGFaceResNet50()
    x = jnp.zeros((1, 224, 224, 3))
    params = model.init(rng, x)
    feats = model.apply(params, x)
    assert feats.shape == (1, 2048)
    assert feats.dtype == jnp.float32


def test_arcface_embeddings_unit_norm(rng):
    # code/face_model.py:92 — embeddings are L2-normalised 512-d vectors.
    model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))  # tiny depth for CPU
    x = jax.random.uniform(rng, (2, 112, 112, 3)) * 255.0
    params = model.init(rng, x)
    emb = model.apply(params, x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_resnet50_scan_units_matches_unrolled(rng):
    """Same scan-vs-unrolled contract for the VGGFace teacher backbone."""
    from alink_tpu.models import (VGGFaceResNet50, stack_bottleneck_params,
                                  unstack_bottleneck_params)
    sizes = (2, 3, 1, 2)
    unroll = VGGFaceResNet50(stage_sizes=sizes, dtype=jnp.float32)
    scan = VGGFaceResNet50(stage_sizes=sizes, dtype=jnp.float32,
                           scan_units=True)
    x = jax.random.uniform(rng, (2, 64, 64, 3)) * 255.0
    pu = unroll.init(rng, x[:1])
    ps = stack_bottleneck_params(pu, sizes)
    want = jax.eval_shape(scan.init, rng, x[:1])
    assert (jax.tree.map(lambda a: jnp.asarray(a).shape, ps)
            == jax.tree.map(lambda a: a.shape, want))
    np.testing.assert_allclose(np.asarray(scan.apply(ps, x)),
                               np.asarray(unroll.apply(pu, x)),
                               rtol=2e-5, atol=2e-4)
    back = unstack_bottleneck_params(ps, sizes)
    eq = jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), pu, back)
    assert all(jax.tree.leaves(eq))


def test_arcface_scan_units_matches_unrolled(rng):
    """scan_units runs the same op sequence over stacked params: outputs
    must match the unrolled model given converted params, and the
    stack/unstack converters must round-trip exactly (the checkpoint /
    MXNet-converter layout is the unrolled one)."""
    from alink_tpu.models import stack_ir_params, unstack_ir_params
    sizes = (2, 3, 1, 2)
    unroll = ArcFaceResNet100(stage_sizes=sizes, dtype=jnp.float32)
    scan = ArcFaceResNet100(stage_sizes=sizes, dtype=jnp.float32,
                            scan_units=True)
    x = jax.random.uniform(rng, (2, 112, 112, 3)) * 255.0
    pu = unroll.init(rng, x[:1])
    ps = stack_ir_params(pu, sizes)
    # Layout equals a fresh scanned init (names + leading scan axis).
    want = jax.eval_shape(scan.init, rng, x[:1])
    assert (jax.tree.map(lambda a: jnp.asarray(a).shape, ps)
            == jax.tree.map(lambda a: a.shape, want))
    np.testing.assert_allclose(np.asarray(scan.apply(ps, x)),
                               np.asarray(unroll.apply(pu, x)),
                               atol=1e-5)
    back = unstack_ir_params(ps, sizes)
    eq = jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), pu, back)
    assert all(jax.tree.leaves(eq))


def test_pnet_output_grid_stride2_cell12(rng):
    # code/helper.py:109-110 — stride 2, cell 12: out = (in - 12)//2 + 1.
    model = PNet()
    x = jnp.zeros((1, 36, 48, 3))
    params = model.init(rng, x)
    prob, reg = model.apply(params, x)
    assert prob.shape == (1, 13, 19, 2)
    assert reg.shape == (1, 13, 19, 4)
    np.testing.assert_allclose(np.sum(prob, axis=-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "net,size,chans,outs",
    [(RNet, 24, 3, 2), (ONet, 48, 3, 3)],
)
def test_rnet_onet_shapes(rng, net, size, chans, outs):
    model = net()
    x = jnp.zeros((2, size, size, chans))
    params = model.init(rng, x)
    out = model.apply(params, x)
    assert len(out) == outs
    assert out[0].shape == (2, 2)  # prob
    assert out[1].shape == (2, 4)  # reg
    if outs == 3:
        assert out[2].shape == (2, 10)  # landmarks


def test_lnet_offsets(rng):
    model = LNet()
    x = jnp.zeros((2, 24, 24, 15))
    params = model.init(rng, x)
    out = model.apply(params, x)
    assert out.shape == (2, 5, 2)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


def test_preprocess_vggface_v2():
    # code/siamese.py:211-213 — RGB->BGR flip + mean subtract.
    x = jnp.zeros((1, 2, 2, 3))
    y = preprocess.vggface(x, version=2)
    np.testing.assert_allclose(
        np.asarray(y)[0, 0, 0], [-91.4953, -103.8827, -131.0912], rtol=1e-5
    )


def test_preprocess_vggface_uint8_promotes():
    """Integer input must promote before the mean subtraction — a uint8
    cast of the means truncates and unsigned subtraction wraps (50 - 91
    -> 215), silently corrupting features (round-5 regression guard)."""
    x = jnp.full((1, 2, 2, 3), 50, jnp.uint8)
    y = preprocess.vggface(x, version=2)
    assert jnp.issubdtype(y.dtype, jnp.floating)
    np.testing.assert_allclose(
        np.asarray(y)[0, 0, 0],
        [50 - 131.0912, 50 - 103.8827, 50 - 91.4953][::-1], rtol=1e-5)


def test_preprocess_mtcnn():
    # code/helper.py:89.
    np.testing.assert_allclose(preprocess.mtcnn(jnp.float32(127.5)), 0.0)
    np.testing.assert_allclose(
        preprocess.mtcnn(jnp.float32(255.0)), 127.5 * 0.0078125, rtol=1e-6
    )
