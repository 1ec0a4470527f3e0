"""Classical active-learning baseline — Multi-PIE cross-resolution variant.

Reference: ``code/existing_AL_MTP.py`` — the low-resolution counterpart of
``existing_al.py``.  The reference file is broken as shipped (it imports a
``readMTP3`` module and references a ``conversionModel`` that do not exist,
existing_AL_MTP.py:2,66 — latent bugs catalogued in SURVEY.md section 2.1);
this driver implements what that baseline was meant to do: pool-based
uncertainty sampling over low-resolution Multi-PIE pairs with a SmallRes
student.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alink_tpu import train as T
from alink_tpu.active import ActiveLearner
from alink_tpu.active.uncertainty import get_strategy
from alink_tpu.config import MTPConfig
from alink_tpu.data import balanced_pair_batches, load_person_stacks, scan_mtp
from alink_tpu.drivers.alink import parse_config
from alink_tpu.drivers.alink_mtp import make_smallres_state
from alink_tpu.models import preprocess


def run_existing_al_mtp(
    config: MTPConfig,
    *,
    query_strategy: str = "uncertainty_sampling",
    n_rounds: int = 50,
    n_steps: int = 320000,
    key: jax.Array | None = None,
) -> ActiveLearner:
    key = key if key is not None else jax.random.PRNGKey(config.seed)
    keys = iter(jax.random.split(key, 8))

    groups = scan_mtp(config.data_dir_prefix)
    lo = load_person_stacks(list(groups.values()),
                            (config.low_res, config.low_res),
                            dct_scale=getattr(config, "ingest_dct_scale",
                                              False))

    state = make_smallres_state(next(keys), config)
    raw_gen = balanced_pair_batches(config.seed, lo, None, config.batch_size)
    # One preprocessed stream for BOTH pretraining and the query rounds —
    # a second hand-applied smallres path could silently drift.
    gen = (((preprocess.smallres(jnp.asarray(le)),
             preprocess.smallres(jnp.asarray(r))), y)
           for (le, r), y in raw_gen)

    params, ok = T.maybe_restore(config.lowres_basemodel, state.params)
    if ok:
        state = state.replace(params=params)
    else:
        state, _ = T.custom_train(
            state, gen, epochs=config.lowres_epochs,
            batch_size=config.batch_size, key=next(keys), n_steps=n_steps,
        )
        T.save(config.lowres_basemodel, state.params)

    learner = ActiveLearner(state, get_strategy(query_strategy),
                            key=next(keys), epochs=config.ft_epochs,
                            batch_size=min(64, config.batch_size))
    for _ in range(n_rounds):
        (left, right), y = next(gen)
        idx = learner.query(left, right,
                            n_instances=max(1, len(y) // 10))
        learner.teach(left[idx], right[idx], jnp.asarray(y)[idx],
                      only_new=True)
    T.save(config.out_model, learner.state.params)
    return learner


def main(argv=None) -> None:
    config = parse_config(argv, config_cls=MTPConfig)
    run_existing_al_mtp(config)


if __name__ == "__main__":
    main()
