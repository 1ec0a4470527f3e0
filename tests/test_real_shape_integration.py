"""Real-shape converter -> pipeline -> serving integration (VERDICT r2 #5).

The reference de-facto runs the released ``model-r100-ii`` ArcFace
checkpoint (code/face_model.py:28-41), the MTCNN ``det1..det4`` files
(code/mtcnn_detector.py:52-65), and a genderage checkpoint
(code/face_model.py:95-107), all fetched by ``arcface_prepreq.sh:9-22``.
No real artifact can enter this environment (zero egress), so this test
synthesizes the FULL real-shape fixture set — every parameter at the
released checkpoints' exact shapes and insightface naming, written in
the REAL binary NDArray-save format — and drives it through the entire
deployment path a user of the real files would take:

    .params files -> convert_mxnet CLI -> orbax checkpoints -> restore
    -> FaceModel (detect -> align -> embed, ``pipeline_valid``)
    -> serving.Verifier.verify_pairs / get_ga

so first contact with the real released files is a file-read away, not
a mapping debug session: any name/shape drift between the converters
and the models fails HERE.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alink_tpu.tools import convert_mxnet as cm
from tests.test_convert_mxnet import (_synth_arcface_raw, _synth_mtcnn_raw,
                                      _write_mxnet_file)

pytestmark = pytest.mark.slow

R100_SIZES = (3, 13, 30, 3)   # model-r100-ii (insightface fresnet table)
GA_SIZES = (3, 4, 14, 3)      # gamodel-r50


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    """Five real-shape binary .params files, each through the CLI."""
    root = tmp_path_factory.mktemp("real_shape")
    specs = {
        "arcface": _synth_arcface_raw(stage_sizes=R100_SIZES,
                                      calibrated=True),
        "genderage": _synth_arcface_raw(stage_sizes=GA_SIZES, emb=202,
                                        seed=7, calibrated=True),
        "pnet": _synth_mtcnn_raw("pnet", calibrated=True),
        "rnet": _synth_mtcnn_raw("rnet", calibrated=True),
        "onet": _synth_mtcnn_raw("onet", calibrated=True),
        "lnet": _synth_mtcnn_raw("lnet", calibrated=True),
    }
    dirs = {}
    for kind, raw in specs.items():
        src = root / f"{kind}-0000.params"
        src.write_bytes(_write_mxnet_file(raw, version=2))
        out = root / f"ckpt_{kind}"
        cm.main([kind, str(src), str(out)])
        dirs[kind] = str(out)
    return dirs


@pytest.fixture(scope="module")
def face_model(ckpt_dirs):
    from alink_tpu.detect import CascadeConfig, FaceModel
    from alink_tpu.detect.cascade import MTCNNParams
    from alink_tpu.models import ArcFaceResNet100
    from alink_tpu.models.arcface import stack_ir_params
    from alink_tpu.train.checkpoint import restore

    # scan_units keeps the r100-depth HLO CPU-compilable in seconds (the
    # production cold-start mode); stack_ir_params is the documented
    # bridge from the converter's unrolled layout.
    embedder = ArcFaceResNet100(scan_units=True, dtype=jnp.float32)
    raw_tree = restore(ckpt_dirs["arcface"])
    eparams = {"params": stack_ir_params(raw_tree["params"], R100_SIZES)}
    cparams = MTCNNParams(
        pnet=restore(ckpt_dirs["pnet"]),
        rnet=restore(ckpt_dirs["rnet"]),
        onet=restore(ckpt_dirs["onet"]),
        lnet=restore(ckpt_dirs["lnet"]),
    )
    cfg = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    return FaceModel(eparams, cparams, cfg, embedder=embedder)


def test_pipeline_valid_on_converted_checkpoints(face_model):
    """detect -> align -> embed end to end on the converted real-shape
    parameter set (the exact call path of the real model files)."""
    imgs = jnp.asarray(np.random.default_rng(3).uniform(
        0, 255, (2, 160, 160, 3)).astype(np.float32))
    emb, found = face_model.pipeline_valid(
        face_model.embed_params, face_model.cascade_params, imgs)
    assert emb.shape == (2, 512)
    assert found.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(emb)))
    # thresholds=0 fill every budget slot, so both images must detect
    # and their embeddings be unit-norm (face_model.py:92).
    assert bool(jnp.all(found))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-3)


def test_accurate_landmark_lnet_path(face_model):
    """det4 (L-Net) converts and runs inside the cascade
    (mtcnn_detector.py:478-511, accurate_landmark=True)."""
    import dataclasses

    from alink_tpu.detect.cascade import detect_faces

    cfg = dataclasses.replace(face_model.cfg, accurate_landmark=True)
    imgs = jnp.asarray(np.random.default_rng(4).uniform(
        0, 255, (1, 160, 160, 3)).astype(np.float32))
    det = detect_faces(face_model.cascade_params, imgs, cfg)
    assert det.landmarks.shape == (1, cfg.stage3_budget, 5, 2)
    assert bool(jnp.all(jnp.isfinite(det.landmarks)))
    # L-Net outputs are trunc()'d to integers (mtcnn_detector.py:511).
    valid_lmk = det.landmarks[0][np.asarray(det.valid[0])]
    np.testing.assert_array_equal(np.asarray(valid_lmk),
                                  np.trunc(np.asarray(valid_lmk)))


def test_serving_verify_pairs_end_to_end(face_model):
    """photos -> FaceModel.process -> SiameseHead scores through the
    serving layer: the full deployment story on converted weights."""
    from alink_tpu.models import SiameseHead
    from alink_tpu.serving import Verifier

    head = SiameseHead(dtype=jnp.float32)
    hparams = head.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 512)), jnp.zeros((1, 512)))
    v = Verifier(face_model.process, hparams)
    rng = np.random.default_rng(5)
    left = jnp.asarray(rng.uniform(0, 255, (2, 160, 160, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (2, 160, 160, 3)), jnp.float32)
    p = v.verify_pairs(left, right)
    assert p.shape == (2,)
    assert bool(jnp.all((p >= 0) & (p <= 1)))


def test_genderage_checkpoint_end_to_end(ckpt_dirs, face_model):
    """gamodel .params -> genderage converter -> GenderAgeResNet50 ->
    FaceModel.get_ga decode (face_model.py:95-107)."""
    from alink_tpu.models.arcface import stack_ir_params
    from alink_tpu.models.genderage import GenderAgeResNet50
    from alink_tpu.train.checkpoint import restore

    ga_model = GenderAgeResNet50(scan_units=True, dtype=jnp.float32)
    raw_tree = restore(ckpt_dirs["genderage"])
    ga_params = {"params": stack_ir_params(raw_tree["params"], GA_SIZES)}
    chips = jnp.asarray(np.random.default_rng(6).uniform(
        0, 255, (2, 112, 112, 3)).astype(np.float32))
    gender, age = face_model.get_ga(chips, ga_model, ga_params)
    assert gender.shape == (2,) and age.shape == (2,)
    assert bool(jnp.all((gender >= 0) & (gender <= 1)))
    assert bool(jnp.all((age >= 0) & (age <= 100)))
