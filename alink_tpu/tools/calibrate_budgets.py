"""Calibrate CascadeConfig budgets from a workload sample.

The fixed-budget cascade (detect/cascade.py) is this framework's one
deliberate semantic departure from the reference's dynamic-shape MTCNN:
results are identical whenever each stage's budget covers its candidate
count, and stage cost scales with the budgets (BENCHMARKS.md).  Rather
than guessing between ``CascadeConfig.typical()`` and ``worst_case()``,
this tool profiles YOUR images and prints a config sized at a chosen
quantile with headroom.

Usage::

    python -m alink_tpu.tools.calibrate_budgets /path/to/images \
        [--sample 256] [--quantile 0.99] [--headroom 2.0] \
        [--min_size 40] [--image_res 160]

With no directory, profiles synthetic noise images (smoke mode).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu.detect import CascadeConfig, init_cascade_params
from alink_tpu.detect.cascade import profile_cascade


def recommend(profile: dict, budgets: CascadeConfig, quantile: float,
              headroom: float) -> tuple[dict, list]:
    """Quantile + headroom -> budget recommendation, with saturation
    warnings whenever the profiling run itself may have truncated."""
    warnings = []

    def q(x):
        return float(np.quantile(np.asarray(x, np.float64), quantile))

    def size(x, cap_hit_at, name):
        need = max(1, int(np.ceil(q(x) * headroom)))
        if float(np.max(np.asarray(x))) >= cap_hit_at:
            warnings.append(
                f"{name}: profiling budget {cap_hit_at} saturated — raise "
                "the profiling cfg's budgets and re-run for a trustworthy "
                "number")
        return need

    rec = {
        "stage1_scale_budget": size(profile["scale_raw_max"], 10**9,
                                    "scale_raw_max"),
        "stage1_budget": size(profile["stage1"], budgets.stage1_budget,
                              "stage1"),
        "stage2_budget": size(profile["stage2"], budgets.stage2_budget,
                              "stage2"),
        "stage3_budget": size(profile["stage3"], budgets.stage3_budget,
                              "stage3"),
    }
    # Budgets are monotone along the cascade (each stage consumes the
    # previous one's survivors).
    rec["stage2_budget"] = min(rec["stage2_budget"], rec["stage1_budget"])
    rec["stage3_budget"] = min(rec["stage3_budget"], rec["stage2_budget"])
    return rec, warnings


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="?", default=None,
                    help="directory of JPEG/PNG images (recursed)")
    ap.add_argument("--sample", type=int, default=256)
    ap.add_argument("--quantile", type=float, default=0.99)
    ap.add_argument("--headroom", type=float, default=2.0)
    ap.add_argument("--min_size", type=int, default=40)
    ap.add_argument("--image_res", type=int, default=160)
    ap.add_argument("--thresholds", type=float, nargs=3,
                    default=(0.6, 0.7, 0.8))
    ap.add_argument("--params", default=None,
                    help="orbax checkpoint dir of MTCNN params "
                         "(default: random — synthetic smoke only)")
    args = ap.parse_args(argv)

    res = args.image_res
    if args.images:
        from alink_tpu.data.loader import load_image_list

        paths = []
        for root, _, files in os.walk(args.images):
            paths.extend(os.path.join(root, f) for f in files
                         if f.lower().endswith((".jpg", ".jpeg", ".png")))
        paths = sorted(paths)[: args.sample]
        if not paths:
            raise FileNotFoundError(f"no images under {args.images}")
        imgs = jnp.asarray(load_image_list(paths, (res, res)))
    else:
        imgs = jax.random.uniform(
            jax.random.PRNGKey(0), (min(args.sample, 8), res, res, 3),
            jnp.float32, 0.0, 255.0)

    if args.params:
        # Directory of orbax trees written by tools/convert_mxnet.py:
        # <params>/pnet, <params>/rnet, <params>/onet (+ optional lnet).
        from alink_tpu.detect.cascade import MTCNNParams
        from alink_tpu.train.checkpoint import restore

        nets = {n: restore(os.path.join(args.params, n))
                for n in ("pnet", "rnet", "onet")}
        lnet_dir = os.path.join(args.params, "lnet")
        params = MTCNNParams(
            **nets,
            lnet=restore(lnet_dir) if os.path.isdir(lnet_dir) else None)
    else:
        params = init_cascade_params(jax.random.PRNGKey(1))

    # Profile under generous (worst-case) budgets so truncation is rare;
    # saturation of even these is flagged by recommend().
    prof_cfg = CascadeConfig.worst_case(
        min_size=args.min_size, thresholds=tuple(args.thresholds))
    profile = profile_cascade(params, imgs, prof_cfg)
    rec, warnings = recommend(profile, prof_cfg, args.quantile,
                              args.headroom)

    report = {
        "sampled_images": int(imgs.shape[0]),
        "quantiles": {k: float(np.quantile(np.asarray(v, np.float64),
                                           args.quantile))
                      for k, v in profile.items()},
        "max": {k: int(np.max(np.asarray(v))) for k, v in profile.items()},
        "recommended": rec,
        "warnings": warnings,
    }
    print(json.dumps(report, indent=2))
    print("\nRecommended config:\n"
          f"CascadeConfig(min_size={args.min_size}, "
          f"thresholds={tuple(args.thresholds)},\n"
          f"              stage1_scale_budget={rec['stage1_scale_budget']}, "
          f"stage1_budget={rec['stage1_budget']},\n"
          f"              stage2_budget={rec['stage2_budget']}, "
          f"stage3_budget={rec['stage3_budget']})")


if __name__ == "__main__":
    main()
