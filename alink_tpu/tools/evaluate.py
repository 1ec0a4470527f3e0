"""One-shot DFW evaluation: features -> score matrix -> masked ROC -> stats.

The reference's offline evaluation is four manually-chained scripts
passing files (``generatePredictions.py`` -> ``generateMatrixDFW.py`` ->
``ROC_precompute.py`` -> ``getStats.py``; SURVEY.md section 3.5).  This
runs the whole acceptance chain in one command — featurization in jit'd
batches, the all-pairs matrix as one fused (mesh-sharded) pass, the
threshold sweep vectorised — and prints the reference's stat lines plus
one machine-readable JSON line per ROC case.

    python -m alink_tpu.tools.evaluate --model_ckpt ckpt --mask mask.txt \\
        --prefix DFW_Data/                 # featurize the test list
    python -m alink_tpu.tools.evaluate --model_ckpt ckpt --mask mask.txt \\
        --features processedData.npy       # reuse saved features

Intermediate artifacts are optional outputs (``--save_matrix``,
``--save_tprfpr``) so the individual reference-compatible tools can
still pick them up.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from alink_tpu.evaluation import CASE_NAMES as _CASES


def evaluate_scores(scores: np.ndarray, mask: np.ndarray, roc_case: int,
                    thresholds: np.ndarray):
    """Masked split + sweep + stats for one ROC case
    (= evaluation.roc_from_scores; kept as the tool's seam for tests)."""
    from alink_tpu.evaluation import roc_from_scores

    return roc_from_scores(scores, mask, roc_case, thresholds)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_ckpt", required=True,
                        help="orbax checkpoint of siamese head params")
    parser.add_argument("--mask", required=True,
                        help="mask matrix (codes 1-4, ROC_precompute.py)")
    parser.add_argument("--prefix", default=None,
                        help="dataset prefix with Testing_data_face_name.txt"
                             " (featurizes the test list)")
    parser.add_argument("--features", default=None,
                        help="saved feature stack (skips featurization)")
    parser.add_argument("--backbone_ckpt", default=None,
                        help="featurizer params (with --prefix)")
    parser.add_argument("--roc_case", type=int, default=0,
                        choices=(0, 1, 2, 3),
                        help="1=impersonation 2=obfuscation 3=overall "
                             "0=all three")
    parser.add_argument("--thresholds", default=None,
                        help="thresholds file (default: 10001 in [0,1])")
    parser.add_argument("--save_matrix", default=None)
    parser.add_argument("--save_tprfpr", default=None,
                        help="savetxt [TPR, FPR] path (per case, suffixed "
                             "when --roc_case 0)")
    args = parser.parse_args(argv)
    if (args.prefix is None) == (args.features is None):
        parser.error("exactly one of --prefix / --features is required")

    import jax

    from alink_tpu import train as T
    from alink_tpu.tools.generate_matrix import restore_head_and_score

    if args.features:
        feats = np.load(args.features)
    else:
        from alink_tpu.drivers.common import make_resnet50_featurizer
        from alink_tpu.tools.generate_predictions import generate_predictions

        key = jax.random.PRNGKey(0)
        featurize, params = make_resnet50_featurizer(key)
        if args.backbone_ckpt:
            params = T.restore(args.backbone_ckpt, params)
            featurize, _ = make_resnet50_featurizer(key, params=params)
        with open(os.path.join(args.prefix,
                               "Testing_data_face_name.txt")) as f:
            names = [line.rstrip() for line in f]
        feats = generate_predictions(args.prefix, names, featurize)
    print(f"features: {feats.shape}")

    scores = restore_head_and_score(args.model_ckpt, feats)
    print(f"score matrix: {scores.shape}")
    if args.save_matrix:
        np.save(args.save_matrix, scores)

    mask = (np.load(args.mask) if args.mask.endswith(".npy")
            else np.loadtxt(args.mask)).astype(int)
    thresholds = (np.loadtxt(args.thresholds) if args.thresholds
                  else np.linspace(0.0, 1.0, 10001))

    cases = (1, 2, 3) if args.roc_case == 0 else (args.roc_case,)
    for case in cases:
        tpr, fpr, stats = evaluate_scores(scores, mask, case, thresholds)
        if args.save_tprfpr:
            path = args.save_tprfpr
            if len(cases) > 1:
                root, ext = os.path.splitext(path)
                path = f"{root}_{_CASES[case]}{ext}"
            np.savetxt(path, np.array([tpr, fpr]))
        # The reference's getStats.py output lines, per case.
        from alink_tpu.tools.get_stats import print_stats

        print(f"[{_CASES[case]}]")
        print_stats(stats)
        print(json.dumps({
            "case": _CASES[case], "auc": round(float(stats.auc), 6),
            "eer": round(float(stats.eer), 6),
            "gar_at_1pct_far": round(float(stats.gar_at_1pct_far), 6),
            "gar_at_01pct_far": round(float(stats.gar_at_01pct_far), 6),
        }))


if __name__ == "__main__":
    main()
