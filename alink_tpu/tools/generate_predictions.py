"""Featurize the DFW test list -> processedData.npy.

Reference: ``utilities/generatePredictions.py`` — reads
``<prefix>/Testing_data_face_name.txt`` (7,771 file names), featurizes each
face with RESNET50 *one image at a time* (:56-57) and saves the feature
stack.  Here the list is decoded on a thread pool and embedded in large
jit'd batches.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from alink_tpu.data.loader import load_image_list
from alink_tpu.data.manifest import lookup_file
from alink_tpu.drivers.common import make_resnet50_featurizer


def generate_predictions(prefix: str, names: list[str], featurize,
                         image_res=(224, 224), batch: int = 256
                         ) -> np.ndarray:
    paths = []
    missing = []
    for name in names:
        resolved = lookup_file(os.path.join(prefix, name))
        if resolved is None:
            missing.append(name)
            continue
        paths.append(resolved)
    if missing:
        # The downstream masks are positional over exactly this list
        # (generateMatrixDFW.py:29 asserts 7,771 rows), so silently
        # skipping (the reference's try/except, generatePredictions.
        # py:43-48) would shift every genuine/imposter label after the
        # first dropped index.  Fail loudly instead.
        raise FileNotFoundError(
            f"{len(missing)} of {len(names)} test-list images not found "
            f"(first few: {missing[:5]}); the ROC masks are positional, "
            "so a partial feature stack would mislabel every pair after "
            "the first gap")
    images = load_image_list(paths, image_res)
    feats = []
    for i in range(0, len(images), batch):
        feats.append(np.asarray(featurize(images[i:i + batch])))
    return np.concatenate(feats)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("prefix", help="dataset prefix containing "
                        "Testing_data_face_name.txt")
    parser.add_argument("--out", default="processedData.npy")
    parser.add_argument("--backbone_ckpt", default=None,
                        help="orbax checkpoint of featurizer params")
    args = parser.parse_args(argv)

    with open(os.path.join(args.prefix, "Testing_data_face_name.txt")) as f:
        names = [line.rstrip() for line in f]

    params = None
    if args.backbone_ckpt:
        from alink_tpu import train as T

        params = T.restore(args.backbone_ckpt)
    featurize, _ = make_resnet50_featurizer(jax.random.PRNGKey(0), params)
    feats = generate_predictions(args.prefix, names, featurize)
    np.save(args.out, feats)
    print(f"wrote {args.out}: {feats.shape}")


if __name__ == "__main__":
    main()
