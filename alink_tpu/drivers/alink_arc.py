"""A-LINK / A2-LINK driver — ArcFace configuration.

Reference: ``code/ALINK_arc.py`` — the same algorithm as ALINK.py with the
InsightFace ArcFace embedding stack: 112x112 inputs, 512-d L2-normalised
features (``siamese.ArcFace`` -> ``face_model.FaceModel``,
ALINK_arc.py:64), and perlin in the default noise bank (:41).

The reference's ArcFace path was locked to batch=1 with a per-image Python
loop (face_model.py:39, siamese.py:232-234); here the embedder is the jit'd
batched ``ArcFaceResNet100`` (optionally behind the full MTCNN
detect->align pipeline via ``detect.FaceModel``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alink_tpu.config import ALinkArcConfig
from alink_tpu.drivers.alink import parse_config, run_alink
from alink_tpu.models import (ArcFaceResNet34, ArcFaceResNet50,
                              ArcFaceResNet100)

_DEPTHS = {34: ArcFaceResNet34, 50: ArcFaceResNet50,
           100: ArcFaceResNet100}


def make_arcface_featurizer(key: jax.Array, params=None, depth: int = 100,
                            scan_units: bool = False):
    """Batched 512-d ArcFace embedder (face_model.py:86-93 without the
    batch=1 limit).  Random params unless given (pretrained weights
    restore via train.checkpoint).  ``depth`` picks the LResNet zoo
    member (34/50/100) matching whichever checkpoint the deployment
    converted — the reference's --model flag plays the same role.
    ``scan_units`` compiles each stage as one scan body (fast cold
    start); ``params`` given in the standard unrolled layout are
    converted automatically."""
    model = _DEPTHS[depth](scan_units=scan_units)
    if params is None:
        params = model.init(key, jnp.zeros((1, 112, 112, 3), jnp.float32))
    elif scan_units:
        from alink_tpu.models import stack_ir_params

        params = stack_ir_params(params, model.stage_sizes)

    @jax.jit
    def featurize(images):
        return model.apply(params, images)

    return featurize, params


def main(argv=None) -> None:
    config = parse_config(argv, config_cls=ALinkArcConfig)
    featurize, _ = make_arcface_featurizer(
        jax.random.PRNGKey(config.seed + 100), depth=config.embed_depth,
        scan_units=config.embed_scan_units
    )
    run_alink(config, featurize=featurize)


if __name__ == "__main__":
    main()
