"""MXNet -> flax converter: structural and numeric mapping checks.

No mxnet (or real checkpoint) exists in this environment, so the raw
parameter dicts are synthesised with insightface's naming and MXNet's
layouts (OIHW convs, NCHW-flattened FCs); the mapped trees must slot
into the flax models exactly and preserve the numerics that matter
(BN folding, flatten-order permutation)."""

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.models import ArcFaceResNet100
from alink_tpu.models.mtcnn import LNet, ONet, PNet, RNet
from alink_tpu.tools import convert_mxnet as cm


def _bn_raw(rng, base, c):
    return {
        f"{base}_gamma": rng.normal(size=(c,)).astype(np.float32),
        f"{base}_beta": rng.normal(size=(c,)).astype(np.float32),
        f"{base}_moving_mean": rng.normal(size=(c,)).astype(np.float32),
        f"{base}_moving_var": rng.uniform(0.5, 2.0, (c,)).astype(np.float32),
    }


def _conv_raw(rng, base, cin, cout, k=3, bias=False):
    out = {f"{base}_weight":
           rng.normal(size=(cout, cin, k, k)).astype(np.float32)}
    if bias:
        out[f"{base}_bias"] = rng.normal(size=(cout,)).astype(np.float32)
    return out


def _synth_arcface_raw(stage_sizes=(1, 1, 1, 1),
                       widths=(64, 128, 256, 512),
                       emb=512, tail="pre_fc1_bn", seed=0,
                       calibrated=False):
    """Synthesize an LResNet raw dict in insightface naming.

    ``tail``: "pre_fc1_bn" = recognition layout (pre_fc1 FC + fc1 BN,
    model-r100-ii); "fc1_fc" = a bare fc1 FullyConnected with no output
    BN (the other layout genderage-style checkpoints use).

    ``calibrated``: variance-preserving weight scales (He-init convs,
    near-identity BN affines).  N(0,1) conv entries amplify activations
    ~sqrt(9*cin) per layer — harmless at the toy depths the unit tests
    use, guaranteed overflow through a real r100's 100 layers, so the
    real-shape integration fixtures need finite-forward statistics.
    Names and shapes are identical either way.
    """
    rng = np.random.default_rng(seed)
    raw = {}
    if calibrated:
        def _conv_raw(rng, base, cin, cout, k=3, bias=False):
            std = np.sqrt(2.0 / (k * k * cin))
            out = {f"{base}_weight": (std * rng.normal(
                size=(cout, cin, k, k))).astype(np.float32)}
            if bias:
                out[f"{base}_bias"] = np.zeros((cout,), np.float32)
            return out

        def _bn_raw(rng, base, c):
            return {
                f"{base}_gamma": rng.uniform(0.8, 1.2, (c,)).astype(
                    np.float32),
                f"{base}_beta": (0.1 * rng.normal(size=(c,))).astype(
                    np.float32),
                f"{base}_moving_mean": (0.1 * rng.normal(size=(c,))).astype(
                    np.float32),
                f"{base}_moving_var": rng.uniform(0.9, 1.1, (c,)).astype(
                    np.float32),
            }
    else:
        _conv_raw = globals()["_conv_raw"]
        _bn_raw = globals()["_bn_raw"]
    raw.update(_conv_raw(rng, "conv0", 3, 64))
    raw.update(_bn_raw(rng, "bn0", 64))
    raw["relu0_gamma"] = rng.uniform(0.1, 0.3, (64,)).astype(np.float32)
    cin = 64
    for s, (blocks, w) in enumerate(zip(stage_sizes, widths), start=1):
        for u in range(1, blocks + 1):
            base = f"stage{s}_unit{u}"
            raw.update(_bn_raw(rng, f"{base}_bn1", cin))
            raw.update(_conv_raw(rng, f"{base}_conv1", cin, w))
            raw.update(_bn_raw(rng, f"{base}_bn2", w))
            raw[f"{base}_relu1_gamma"] = rng.uniform(
                0.1, 0.3, (w,)).astype(np.float32)
            raw.update(_conv_raw(rng, f"{base}_conv2", w, w))
            raw.update(_bn_raw(rng, f"{base}_bn3", w))
            if u == 1:  # stride-2 entry unit projects
                raw.update(_conv_raw(rng, f"{base}_conv1sc", cin, w, k=1))
                raw.update(_bn_raw(rng, f"{base}_sc", w))
            cin = w
    cw = widths[-1]
    raw.update(_bn_raw(rng, "bn1", cw))
    fc = "pre_fc1" if tail == "pre_fc1_bn" else "fc1"
    fc_std = np.sqrt(1.0 / (cw * 7 * 7)) if calibrated else 1.0
    raw[f"{fc}_weight"] = (fc_std * rng.normal(
        size=(emb, cw * 7 * 7))).astype(np.float32)
    raw[f"{fc}_bias"] = rng.normal(size=(emb,)).astype(np.float32)
    if tail == "pre_fc1_bn":
        raw.update(_bn_raw(rng, "fc1", emb))
    return raw


def _tree_shapes(t):
    return jax.tree.map(lambda x: jnp.asarray(x).shape, t)


@pytest.mark.slow
def test_arcface_tree_matches_model_init():
    raw = _synth_arcface_raw()
    tree = cm.arcface_param_tree(raw, stage_sizes=(1, 1, 1, 1))
    model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    assert _tree_shapes(tree) == _tree_shapes(want)
    # The mapped tree must actually run.
    out = model.apply(jax.tree.map(jnp.asarray, tree),
                      jnp.ones((2, 112, 112, 3)))
    assert out.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                               1.0, atol=1e-3)


def test_stage_size_inference_covers_the_zoo():
    """arcface_param_tree(raw) with no stage_sizes reads the depth off
    the checkpoint keys — one converter for r34/r50/r100 shaped files."""
    sizes = (2, 1, 3, 1)
    raw = _synth_arcface_raw(stage_sizes=sizes)
    assert cm.infer_stage_sizes(raw) == sizes
    tree = cm.arcface_param_tree(raw)  # inferred
    want = cm.arcface_param_tree(raw, stage_sizes=sizes)
    assert _tree_shapes(tree) == _tree_shapes(want)
    with pytest.raises(KeyError):
        cm.infer_stage_sizes({"conv0_weight": raw["conv0_weight"]})
    # A gap in the unit numbering must raise, not silently infer a
    # shallower model (stage 3 here has units 1-3; dropping unit 2
    # leaves orphans 3 at a counted prefix of 1).
    gapped = {k: v for k, v in raw.items()
              if not k.startswith("stage3_unit2_")}
    with pytest.raises(KeyError, match="contiguous"):
        cm.infer_stage_sizes(gapped)


def test_arcface_variant_factories():
    from alink_tpu.models import ArcFaceResNet34, ArcFaceResNet50
    assert ArcFaceResNet50().stage_sizes == (3, 4, 14, 3)
    assert ArcFaceResNet34().stage_sizes == (3, 4, 6, 3)
    # Same IR topology/head: the converter's inferred tree for an
    # r34-depth synthetic checkpoint must init-match the factory model.
    sizes = (3, 4, 6, 3)
    raw = _synth_arcface_raw(stage_sizes=sizes)
    tree = cm.arcface_param_tree(raw)
    model = ArcFaceResNet34()
    want = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 112, 112, 3)))
    assert _tree_shapes(tree) == jax.tree.map(lambda s: s.shape, want)


def test_fc1_bn_folding():
    raw = _synth_arcface_raw()
    tree = cm.arcface_param_tree(raw, stage_sizes=(1, 1, 1, 1))["params"]
    g, b = raw["fc1_gamma"], raw["fc1_beta"]
    m, v = raw["fc1_moving_mean"], raw["fc1_moving_var"]
    x = np.linspace(-2, 2, 512).astype(np.float32)
    want = (x - m) / np.sqrt(v + 2e-5) * g + b
    got = x * tree["fc1_gamma"] + tree["fc1_beta"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_genderage_tree_matches_model_and_decodes():
    """The genderage converter maps a gamodel-shaped checkpoint onto
    GenderAgeResNet50 (202-d raw fc1, no L2 norm) and the decode runs."""
    from alink_tpu.models.genderage import GenderAgeResNet50, decode_ga

    raw = _synth_arcface_raw(stage_sizes=(1, 1, 1, 1), emb=202)
    tree = cm.genderage_param_tree(raw, stage_sizes=(1, 1, 1, 1))
    model = GenderAgeResNet50(stage_sizes=(1, 1, 1, 1), dtype=jnp.float32)
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    assert _tree_shapes(tree) == _tree_shapes(want)
    out = model.apply(jax.tree.map(jnp.asarray, tree),
                      jnp.ones((2, 112, 112, 3)))
    assert out.shape == (2, 202)
    # Raw fc1: NOT unit-norm (normalize=False — face_model.py:95-107
    # decodes raw outputs, unlike get_feature's L2 at :92).
    assert not np.allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0)
    gender, age = decode_ga(out)
    assert gender.shape == (2,) and age.shape == (2,)


def test_genderage_bare_fc1_layout():
    """A checkpoint whose head is a bare fc1 FullyConnected (no output
    BN) converts with an identity affine fold."""
    raw = _synth_arcface_raw(stage_sizes=(1, 1, 1, 1), emb=202,
                             tail="fc1_fc")
    tree = cm.genderage_param_tree(raw, stage_sizes=(1, 1, 1, 1))["params"]
    np.testing.assert_array_equal(tree["fc1_gamma"], np.ones(202))
    np.testing.assert_array_equal(tree["fc1_beta"], np.zeros(202))
    assert tree["Dense_0"]["kernel"].shape == (512 * 7 * 7, 202)


def test_genderage_rejects_recognition_width():
    raw = _synth_arcface_raw(stage_sizes=(1, 1, 1, 1))  # 512-d fc1
    with pytest.raises(ValueError, match="202"):
        cm.genderage_param_tree(raw, stage_sizes=(1, 1, 1, 1))


def test_dense_nchw_to_nhwc_permutation():
    # Weight encoding W[o, c*H*W + h*W + w] = c*100 + h*10 + w must land
    # at flax row (h*W + w)*C + c.
    C, H, W = 3, 2, 2
    enc = np.zeros((1, C * H * W), np.float32)
    for c in range(C):
        for h in range(H):
            for w in range(W):
                enc[0, c * H * W + h * W + w] = c * 100 + h * 10 + w
    out = cm._dense_from_nchw({"x_weight": enc}, "x", (C, H, W))["kernel"]
    for c in range(C):
        for h in range(H):
            for w in range(W):
                assert out[(h * W + w) * C + c, 0] == c * 100 + h * 10 + w


def test_conv_oihw_to_hwio():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    k = cm._conv({"c_weight": w}, "c")["kernel"]
    assert k.shape == (5, 7, 3, 2)
    np.testing.assert_array_equal(k[1, 2, 0, 1], w[1, 0, 1, 2])


def _synth_mtcnn_raw(net, calibrated=False):
    """MTCNN det1-4 raw dicts at the released checkpoints' exact shapes.

    ``calibrated`` draws He-scaled weights so tower outputs stay in a
    sane range (raw N(0,1) weights saturate the softmax heads and
    regress boxes to ~1e16 — fine for mapping checks, useless for
    end-to-end fixtures).
    """
    rng = np.random.default_rng(1)
    scale = (lambda cin, k: np.sqrt(2.0 / (k * k * cin))) if calibrated \
        else (lambda cin, k: 1.0)

    def _conv_raw(rng, base, cin, cout, k=3, bias=True):
        out = {f"{base}_weight": (scale(cin, k) * rng.normal(
            size=(cout, cin, k, k))).astype(np.float32)}
        if bias:
            out[f"{base}_bias"] = (np.zeros((cout,), np.float32)
                                   if calibrated else
                                   rng.normal(size=(cout,)).astype(
                                       np.float32))
        return out
    if net == "pnet":
        raw = {}
        for i, (cin, cout, k) in enumerate(
                [(3, 10, 3), (10, 16, 3), (16, 32, 3)], start=1):
            raw.update(_conv_raw(rng, f"conv{i}", cin, cout, k, bias=True))
            raw[f"prelu{i}_gamma"] = rng.uniform(
                0.2, 0.3, (cout,)).astype(np.float32)
        raw.update(_conv_raw(rng, "conv4_1", 32, 2, 1, bias=True))
        raw.update(_conv_raw(rng, "conv4_2", 32, 4, 1, bias=True))
        return raw
    if net == "rnet":
        convs = [(3, 28, 3), (28, 48, 3), (48, 64, 2)]
        fc, chw, width = "conv4", (64, 3, 3), 128
        heads = {"conv5_1": 2, "conv5_2": 4}
    elif net == "lnet":
        convs = [(15, 28, 3), (28, 48, 3), (48, 64, 2)]
        fc, chw, width = "conv4", (64, 3, 3), 256
        heads = {f"conv5_{i}": 2 for i in range(1, 6)}
    else:  # onet
        convs = [(3, 32, 3), (32, 64, 3), (64, 64, 3), (64, 128, 2)]
        fc, chw, width = "conv5", (128, 3, 3), 256
        heads = {"conv6_1": 2, "conv6_2": 4, "conv6_3": 10}
    raw = {}
    for i, (cin, cout, k) in enumerate(convs, start=1):
        raw.update(_conv_raw(rng, f"conv{i}", cin, cout, k, bias=True))
        raw[f"prelu{i}_gamma"] = rng.uniform(
            0.2, 0.3, (cout,)).astype(np.float32)
    cflat = int(np.prod(chw))
    raw[f"{fc}_weight"] = (scale(cflat, 1) * rng.normal(
        size=(width, cflat))).astype(np.float32)
    raw[f"{fc}_bias"] = rng.normal(size=(width,)).astype(np.float32)
    raw[f"prelu{len(convs) + 1}_gamma"] = rng.uniform(
        0.2, 0.3, (width,)).astype(np.float32)
    for name, odim in heads.items():
        raw[f"{name}_weight"] = (scale(width, 1) * rng.normal(
            size=(odim, width))).astype(np.float32)
        raw[f"{name}_bias"] = (0.1 * rng.normal(
            size=(odim,))).astype(np.float32)
    return raw


@pytest.mark.parametrize("net,model,inp", [
    ("pnet", PNet, (1, 12, 12, 3)),
    ("rnet", RNet, (1, 24, 24, 3)),
    ("onet", ONet, (1, 48, 48, 3)),
    ("lnet", LNet, (1, 24, 24, 15)),
])
def test_mtcnn_trees_match_models(net, model, inp):
    raw = _synth_mtcnn_raw(net)
    tree = getattr(cm, f"{net}_param_tree")(raw)
    want = model().init(jax.random.PRNGKey(0), jnp.zeros(inp))
    assert _tree_shapes(tree) == _tree_shapes(want)
    out = model().apply(jax.tree.map(jnp.asarray, tree), jnp.ones(inp))
    for o in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(o)))


def _write_mxnet_file(arrays: dict, version: int = 2,
                      prefix: str = "arg:") -> bytes:
    """Independent writer of the on-disk ``mx.nd.save`` format.

    Byte-for-byte what mxnet's MXNDArraySave emits (``src/c_api/c_api.cc``
    + ``src/ndarray/ndarray.cc`` NDArray::Save): uint64 list magic 0x112,
    uint64 reserved, uint64 count; per blob a uint32 NDArray magic
    (V1 0xF993FAC8 / V2 0xF993FAC9 / V3 0xF993FACA), for V2/V3 an int32
    storage type (kDefaultStorage = 0), uint32 ndim + int64 dims, int32
    dev_type, int32 dev_id, int32 type_flag, raw data; then uint64 name
    count and (uint64 len, bytes) names.  ``version=0`` writes the
    pre-magic legacy blob whose leading uint32 is the ndim of a uint32
    TShape."""
    out = io.BytesIO()
    out.write(struct.pack("<QQQ", 0x112, 0, len(arrays)))
    for v in arrays.values():
        v = np.asarray(v, np.float32)
        if version == 3:
            out.write(struct.pack("<Ii", 0xF993FACA, 0))  # magic, stype
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        elif version == 2:
            out.write(struct.pack("<Ii", 0xF993FAC9, 0))  # magic, stype
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        elif version == 1:
            out.write(struct.pack("<I", 0xF993FAC8))
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        else:  # legacy: uint32 TShape, no magic
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}I", *v.shape))
        out.write(struct.pack("<iii", 1, 0, 0))  # cpu ctx, f32
        out.write(v.tobytes())
    out.write(struct.pack("<Q", len(arrays)))
    for k in arrays:
        kb = f"{prefix}{k}".encode()
        out.write(struct.pack("<Q", len(kb)))
        out.write(kb)
    return out.getvalue()


@pytest.mark.parametrize("version", [0, 1, 2, 3])
def test_params_binary_round_trip(tmp_path, version):
    arrays = {"conv0_weight": np.random.default_rng(0).normal(
        size=(4, 3, 3, 3)).astype(np.float32),
        "bn0_gamma": np.ones((4,), np.float32)}
    p = tmp_path / "model-0000.params"
    p.write_bytes(_write_mxnet_file(arrays, version=version))
    got = cm.load_raw(str(p))
    assert set(got) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(got[k], arrays[k])


def test_params_binary_rejects_sparse(tmp_path):
    buf = io.BytesIO()
    buf.write(struct.pack("<QQQ", 0x112, 0, 1))
    buf.write(struct.pack("<Ii", 0xF993FAC9, 1))  # kRowSparseStorage
    p = tmp_path / "sparse.params"
    p.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="sparse"):
        cm.load_raw(str(p))


def test_params_binary_mixed_prefixes_and_aux(tmp_path):
    """Real checkpoints mix arg: (weights) and aux: (BN stats) prefixes."""
    rng = np.random.default_rng(1)
    arg = {"fc_weight": rng.normal(size=(8, 6)).astype(np.float32)}
    aux = {"bn_moving_mean": rng.normal(size=(6,)).astype(np.float32)}
    out = io.BytesIO()
    out.write(struct.pack("<QQQ", 0x112, 0, 2))
    for v in list(arg.values()) + list(aux.values()):
        out.write(struct.pack("<Ii", 0xF993FAC9, 0))
        out.write(struct.pack("<I", v.ndim))
        out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        out.write(struct.pack("<iii", 1, 0, 0))
        out.write(v.tobytes())
    out.write(struct.pack("<Q", 2))
    for name in ["arg:fc_weight", "aux:bn_moving_mean"]:
        kb = name.encode()
        out.write(struct.pack("<Q", len(kb)))
        out.write(kb)
    p = tmp_path / "mixed.params"
    p.write_bytes(out.getvalue())
    got = cm.load_raw(str(p))
    np.testing.assert_array_equal(got["fc_weight"], arg["fc_weight"])
    np.testing.assert_array_equal(got["bn_moving_mean"],
                                  aux["bn_moving_mean"])


def test_arcface_binary_checkpoint_end_to_end(tmp_path):
    """VERDICT round-1 item 4: a full synthetic model-r100-ii-shaped
    checkpoint, written in the REAL binary NDArray V2 format, must load
    through the binary reader and convert into a working ArcFace forward
    whose numerics match the same raw dict fed in directly."""
    raw = _synth_arcface_raw()
    p = tmp_path / "model-0000.params"
    p.write_bytes(_write_mxnet_file(raw, version=2))
    via_binary = cm.load_raw(str(p))
    assert set(via_binary) == set(raw)

    tree_bin = cm.arcface_param_tree(via_binary, stage_sizes=(1, 1, 1, 1))
    tree_ref = cm.arcface_param_tree(raw, stage_sizes=(1, 1, 1, 1))
    for a, b in zip(jax.tree.leaves(tree_bin), jax.tree.leaves(tree_ref)):
        np.testing.assert_array_equal(a, b)

    model = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 255, (2, 112, 112, 3)).astype(np.float32))
    emb = model.apply(jax.tree.map(jnp.asarray, tree_bin), x)
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Cross-decoder validation (VERDICT r03 item 3): the primary binary reader
# vs an independently-derived strict decoder (tools/mxnet_ndarray_check.py),
# property-tested on randomized checkpoints and fuzzed on malformed input.
# ---------------------------------------------------------------------------

from alink_tpu.tools import mxnet_ndarray_check as mnc  # noqa: E402


def _random_checkpoint(rng, n_arrays, version=2):
    """Randomized array dict: mixed ranks 0..4, mixed dtypes."""
    dtypes = [np.float32, np.float16, np.float64, np.uint8, np.int32,
              np.int8, np.int64]
    arrays = {}
    for i in range(n_arrays):
        nd = int(rng.integers(0, 5))
        shape = tuple(int(rng.integers(1, 6)) for _ in range(nd))
        dt = dtypes[int(rng.integers(0, len(dtypes)))]
        if np.issubdtype(dt, np.floating):
            a = rng.normal(size=shape).astype(dt)
        else:
            a = rng.integers(0, 100, size=shape).astype(dt)
        arrays[f"arr_{i}_{'x'.join(map(str, shape))}"] = a
    return arrays


def _write_mxnet_file_typed(arrays: dict, version: int = 2) -> bytes:
    """Fixture writer variant that preserves dtypes (type_flag per
    array) — exercises every dtype code both decoders claim to handle."""
    tf = {np.dtype(np.float32): 0, np.dtype(np.float64): 1,
          np.dtype(np.float16): 2, np.dtype(np.uint8): 3,
          np.dtype(np.int32): 4, np.dtype(np.int8): 5,
          np.dtype(np.int64): 6}
    out = io.BytesIO()
    out.write(struct.pack("<QQQ", 0x112, 0, len(arrays)))
    for v in arrays.values():
        v = np.asarray(v)
        if version >= 2:
            magic = 0xF993FACA if version == 3 else 0xF993FAC9
            out.write(struct.pack("<Ii", magic, 0))
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        elif version == 1:
            out.write(struct.pack("<I", 0xF993FAC8))
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}q", *v.shape))
        else:
            out.write(struct.pack("<I", v.ndim))
            out.write(struct.pack(f"<{v.ndim}I", *v.shape))
        out.write(struct.pack("<iii", 1, 0, tf[v.dtype]))
        out.write(v.tobytes())
    out.write(struct.pack("<Q", len(arrays)))
    for k in arrays:
        kb = k.encode()
        out.write(struct.pack("<Q", len(kb)))
        out.write(kb)
    return out.getvalue()


@pytest.mark.parametrize("version", [0, 1, 2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cross_decoder_agreement_randomized(tmp_path, version, seed):
    """Both decoders must produce identical names/shapes/values on
    randomized checkpoints in every format version."""
    rng = np.random.default_rng(seed * 17 + version)
    arrays = _random_checkpoint(rng, int(rng.integers(1, 8)))
    if version < 2:
        # legacy/V1 fixtures are f32-only (type_flag constant).
        arrays = {k: np.asarray(v, np.float32) for k, v in arrays.items()}
    data = _write_mxnet_file_typed(arrays, version=version)
    p = tmp_path / "ck.params"
    p.write_bytes(data)

    primary = cm.read_mxnet_ndarray_file(str(p))
    second = mnc.read_params_file(str(p))
    assert set(primary) == set(second) == set(arrays)
    for k in arrays:
        assert second[k].dtype == arrays[k].dtype  # dtype preserved
        np.testing.assert_array_equal(second[k], arrays[k])
        np.testing.assert_array_equal(
            primary[k], np.asarray(arrays[k], np.float32))


def test_cross_check_entry_point(tmp_path):
    arrays = {"w": np.arange(12, dtype=np.float32).reshape(3, 4)}
    p = tmp_path / "ok.params"
    p.write_bytes(_write_mxnet_file_typed(arrays))
    got = mnc.cross_check(str(p))
    np.testing.assert_array_equal(got["w"], arrays["w"])


@pytest.mark.parametrize("mutate", [
    "bad_list_magic", "truncate_header", "truncate_payload",
    "truncate_names", "sparse", "bad_dtype", "huge_ndim",
    "unnamed_list", "trailing_garbage",
])
def test_cross_decoder_fuzz_malformed(tmp_path, mutate):
    """Malformed input must raise cleanly from BOTH decoders — never
    return silently wrong data.  (The primary decoder may raise
    struct/Value errors; the strict decoder always ValueError.)"""
    arrays = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": np.ones(3, np.float32)}
    data = bytearray(_write_mxnet_file_typed(arrays))
    if mutate == "bad_list_magic":
        data[0:8] = struct.pack("<Q", 0xDEAD)
    elif mutate == "truncate_header":
        data = data[:12]
    elif mutate == "truncate_payload":
        data = data[:40]
    elif mutate == "truncate_names":
        data = data[:-4]
    elif mutate == "sparse":
        data[28:32] = struct.pack("<i", 1)  # first blob's stype
    elif mutate == "bad_dtype":
        # first blob: magic(4)+stype(4)+ndim(4)+2*8 dims+dev(8) -> tf at 24+
        off = 24 + 4 + 4 + 4 + 16 + 8
        data[off:off + 4] = struct.pack("<i", 99)
    elif mutate == "huge_ndim":
        data[32:36] = struct.pack("<I", 0xFFFF)
    elif mutate == "unnamed_list":
        # name-table count -> 0 (names follow the two payload blobs).
        name_block = struct.pack("<Q", 2)
        idx = bytes(data).rindex(name_block + struct.pack("<Q", 1) + b"w")
        data = data[:idx] + struct.pack("<Q", 0)
    elif mutate == "trailing_garbage":
        data = bytes(data) + b"\x00" * 8
    p = tmp_path / "bad.params"
    p.write_bytes(bytes(data))

    with pytest.raises(Exception):
        mnc.read_params_file(str(p))
    if mutate != "trailing_garbage":
        # The primary reader tolerates trailing bytes (it reads by
        # offset); everything else must fail there too.
        with pytest.raises(Exception):
            cm.read_mxnet_ndarray_file(str(p))


def test_primary_rejects_unnamed_list(tmp_path):
    """The latent zip() bug: an unnamed list-form save must raise, not
    silently return an empty dict."""
    out = io.BytesIO()
    v = np.ones((2, 2), np.float32)
    out.write(struct.pack("<QQQ", 0x112, 0, 1))
    out.write(struct.pack("<Ii", 0xF993FAC9, 0))
    out.write(struct.pack("<I", 2))
    out.write(struct.pack("<2q", 2, 2))
    out.write(struct.pack("<iii", 1, 0, 0))
    out.write(v.tobytes())
    out.write(struct.pack("<Q", 0))  # zero names
    p = tmp_path / "list.params"
    p.write_bytes(out.getvalue())
    with pytest.raises(ValueError, match="unnamed"):
        cm.read_mxnet_ndarray_file(str(p))
    with pytest.raises(ValueError, match="unnamed"):
        mnc.read_params_file(str(p))
