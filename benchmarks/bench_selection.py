"""Benchmark: one A-LINK selection round at DFW scale (no adversarial).

BASELINE.json config #4 ("Full A-LINK loop: committee uncertainty + active
selection + teacher-student fine-tune").  Measures the device pipeline per
1024-pair chunk at 224x224 with the real VGGFace-ResNet50 featurizer
(random weights — throughput is weight-independent), a 3-member committee,
and the four stochastic noise channels.  The adversarial channel is
benchmarked separately (bench_attack.py) since its cost is dominated by
featurizer evaluations inside DE.

Reference equivalent: every step of this pipeline crossed Python->GPU per
call, with the featurizer at batch=128 and noise in per-image host loops
(SURVEY.md section 3.1).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu import train as T
from alink_tpu.active.committee import Committee
from alink_tpu.active.loop import ALinkLoop
from alink_tpu.config import ALinkConfig
from alink_tpu.data.loader import PersonStacks
from alink_tpu.drivers.common import make_resnet50_featurizer
from alink_tpu.models import SiameseHead


def main():
    key = jax.random.PRNGKey(0)
    featurize, _ = make_resnet50_featurizer(key)
    head = SiameseHead()
    d = 2048
    members = [head.init(jax.random.fold_in(key, i), jnp.zeros((1, d)),
                         jnp.zeros((1, d))) for i in range(3)]
    noise = ("gaussian", "saltpepper", "poisson", "speckle")
    committee = Committee.from_param_list(head, members, noise)
    m2 = T.create_train_state(head, key, jnp.zeros((2, d)),
                              jnp.zeros((2, d)))
    rng = np.random.default_rng(0)
    # 4 persons x 4 images per group -> (16x16)*2 = 512 pairs = 1 chunk
    # at device_batch 512.
    plain = PersonStacks(
        rng.uniform(0, 255, (4, 4, 224, 224, 3)).astype(np.float32),
        np.full(4, 4, np.int32))
    dig = PersonStacks(
        rng.uniform(0, 255, (4, 4, 224, 224, 3)).astype(np.float32),
        np.full(4, 4, np.int32))

    # Both chunking modes (config.device_batch tradeoff): 512 pairs per
    # dispatch (high-latency-link mode) vs 64 pairs (128-image
    # featurizer calls — the measured ResNet50 sweet spot on
    # locally-attached hosts, BENCHMARKS.md "ResNet50 batch-size curve").
    for db in (512, 64):
        cfg = ALinkConfig(noise=noise, alink_bs=4, batch_send=10**9,
                          num_ensemble_models=3, device_batch=db)
        loop = ALinkLoop(cfg, featurize=featurize, committee=committee,
                         m2_state=m2, pool_uint8=True, key=key)
        # Steady-state protocol: selection outcomes vary per round, so
        # the post-select gather widths walk their power-of-two buckets
        # over the first rounds — three warm iterations exhaust the
        # bucket compiles (one cold bucket used to cost ~4.5 s of
        # retrace); report the median of three timed rounds.
        for _ in range(3):
            loop.run_iteration(plain, dig)
        loop.timings.totals.clear()
        loop.timings.counts.clear()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            log = loop.run_iteration(plain, dig)
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        out = {
            "device_batch": db,
            "pairs": log.pairs,
            "noise_channels": len(noise),
            "committee_members": 3,
            "round_seconds": round(wall, 3),
            "round_seconds_all": [round(w, 3) for w in walls],
            "pairs_per_second": round(log.pairs / wall, 1),
            "phases_ms_3rounds": {k: round(v * 1e3, 1)
                                  for k, v in loop.timings.as_dict().items()},
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
