"""Benchmark: one-pixel DE attack through a REAL model (A2-LINK config).

``bench_attack.py`` times the DE machinery with a toy fitness; this
benchmark measures the reference's practically-run adversarial
configuration — ``ALINK_MTP.py:53`` defaults the noise bank to
adversarial-only, attacking the SmallRes student directly on raw low-res
pair images (code/siamese.py:134-170, code/noise.py:171-188) — so the
fitness really is the full twin-tower forward for every DE candidate.

Cost structure (why this is the honest number): the attack evaluates
``popsize x maxiter`` full model forwards per pair.  The reference pays
that same FLOP bill serially at batch=1 through Python->GPU crossings
(attack.py:94-101); here the whole (pairs x population) grid is one
batched forward per generation, so the bound is the MXU roofline, not
dispatch latency.  A receptive-field-incremental forward does NOT help:
40 perturbed pixels scattered over a 96x48 concat image cover the whole
activation map past the first pooling stage (ROADMAP.md item 4,
re-evaluated) — the honest lever is exactly this batching.
"""

import json
import time

import jax
import jax.numpy as jnp

from alink_tpu.models import SmallRes, preprocess
from alink_tpu.ops import attack as attack_ops


def sync(x):
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"
    n = 16 if on_tpu else 2
    res = 48 if on_tpu else 12  # GlobalConstants.low_res (ALINK_MTP.py:38)
    model = SmallRes(feature_dim=256)
    key = jax.random.PRNGKey(0)
    left = jax.random.uniform(key, (n, res, res, 3), jnp.float32, 0, 255)
    right = jax.random.uniform(jax.random.fold_in(key, 1),
                               (n, res, res, 3), jnp.float32, 0, 255)
    params = model.init(jax.random.PRNGKey(1), left[:1], right[:1])

    def predict(p, lh, rh):
        return model.apply(p, preprocess.smallres(lh),
                           preprocess.smallres(rh))

    maxiter, popsize = (50, 250) if on_tpu else (2, 10)
    pixels = 40 if on_tpu else 2

    clean = predict(params, left, right)
    # Hard case: the target class is the one the model does NOT predict,
    # so the per-pair early stop (attack_success, attack.py:44-57) cannot
    # fire until DE actually flips the prediction — the full
    # popsize x maxiter fitness bill.  Easy case: M1's label agrees with
    # M2 already (the common selection-loop situation), early stop fires
    # on the first generation.
    hard = jax.nn.one_hot(1 - jnp.argmax(clean, -1), 2)
    easy = jax.nn.one_hot(jnp.argmax(clean, -1), 2)

    def run(p, targets, key):
        return attack_ops.one_pixel_attack_pairs(
            predict, p, left, right, targets, key,
            pixel_count=pixels, maxiter=maxiter, popsize=popsize)

    pop = max(1, popsize // (5 * pixels)) * 5 * pixels
    fwd = 2 * n * pop * maxiter  # full bill: 2 tower fwds per candidate
    out = {
        "pairs": n,
        "config": f"{pixels}px/{maxiter}iter/pop{pop}/smallres{res}",
    }
    for name, tgt in (("hard", hard), ("easy", easy)):
        nl, _ = run(params, tgt, key)
        sync(nl)
        t0 = time.perf_counter()
        nl, _ = run(params, tgt, jax.random.fold_in(key, 2))
        sync(nl)
        dt = time.perf_counter() - t0
        out[f"{name}_batch_s"] = round(dt, 3)
        out[f"{name}_ms_per_pair"] = round(dt * 1e3 / n, 1)
    out["full_bill_tower_forwards"] = fwd
    out["hard_forwards_per_sec"] = round(fwd / out["hard_batch_s"], 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
