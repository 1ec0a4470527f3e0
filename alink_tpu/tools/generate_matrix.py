"""Build the all-pairs similarity matrix from saved features.

Reference: ``utilities/generateMatrixDFW.py`` — loads the siamese model and
``processedData.npy`` and predicts the 7771x7771 matrix row by row
(:30-35), writing ``np.savetxt`` output.  Here the whole grid is one fused
pairwise pass (alink_tpu.ops.pairwise), sharded over the mesh when more
than one device is available.

Score convention: entry (i, j) = P(genuine) (the 2-class softmax's class-1
probability, the convention of the drivers, ALINK.py:175).  The reference
script stored class-0 probabilities (generateMatrixDFW.py:33, ``out[0]``)
— an inconsistency across its own tools; downstream masks are
polarity-symmetric so either works, but we standardise on P(genuine).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from alink_tpu import train as T
from alink_tpu.models import SiameseHead
from alink_tpu.ops.pairwise import score_matrix, score_matrix_sharded
from alink_tpu.parallel import create_mesh


def restore_head_and_score(model_ckpt: str, feats: np.ndarray
                           ) -> np.ndarray:
    """Restore a SiameseHead checkpoint and score the full feats x feats
    matrix — sharded over the mesh when multiple devices exist.  Shared
    by this tool and tools/evaluate.py (one copy of the dispatch)."""
    head = SiameseHead()
    like = head.init(jax.random.PRNGKey(0),
                     np.zeros((1, feats.shape[1]), np.float32),
                     np.zeros((1, feats.shape[1]), np.float32))
    params = T.restore(model_ckpt, like)
    if len(jax.devices()) > 1:
        scores = score_matrix_sharded(create_mesh((-1,)), params,
                                      feats, feats)
    else:
        scores = score_matrix(params, feats, feats)
    return np.asarray(scores)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_ckpt", help="orbax checkpoint of head params")
    parser.add_argument("out", help="output path (.npy, or .txt for "
                        "reference-compatible savetxt)")
    parser.add_argument("--features", default="processedData.npy")
    args = parser.parse_args(argv)

    feats = np.load(args.features)
    scores = restore_head_and_score(args.model_ckpt, feats)
    if args.out.endswith(".txt"):
        np.savetxt(args.out, scores)
    else:
        np.save(args.out, scores)
    print(f"wrote {args.out}: {scores.shape}")


if __name__ == "__main__":
    main()
