"""Classical active-learning baseline driver.

Reference: ``code/existing_al.py`` — the paper's comparison baseline: a
single siamese verifier trained by pool-based uncertainty/margin/entropy
sampling (modAL ``ActiveLearner``) over combined normal+disguised DFW pairs
(``getAllTrainData(combine_normal_imp=True)``, existing_al.py:62-70).

The sklearn/Keras adapter (``code/keras_wrapper.py``) is unnecessary with
functional TrainStates (see active/learners.py), so the driver wires the
learner directly.
"""

from __future__ import annotations

import jax

from alink_tpu import train as T
from alink_tpu.active import ActiveLearner
from alink_tpu.active.uncertainty import get_strategy
from alink_tpu.config import ExistingALConfig
from alink_tpu.data import balanced_pair_batches, load_person_stacks, scan_dfw
from alink_tpu.drivers import common
from alink_tpu.drivers.alink import parse_config


def run_existing_al(
    config: ExistingALConfig,
    *,
    featurize=None,
    n_rounds: int = 50,
    n_steps: int = 320000,
    key: jax.Array | None = None,
) -> ActiveLearner:
    """existing_al.py main flow: pretrain-if-missing, then query/teach."""
    key = key if key is not None else jax.random.PRNGKey(config.seed)
    keys = iter(jax.random.split(key, 8))
    if featurize is None:
        featurize, _ = common.make_resnet50_featurizer(
            next(keys),
            scan_units=getattr(config, 'featurize_scan_units', False))

    # combine_normal_imp=True folds disguised faces into the normal group
    # (existing_al.py:62, readDFW.py:87-94).
    people = scan_dfw(config.data_dir_prefix, config.train_images_dir,
                      combine_normal_imp=True)
    res = tuple(config.image_res)
    dct = getattr(config, "ingest_dct_scale", False)
    plain = common.featurize_stacks(
        load_person_stacks([p.plain for p in people], res, dct_scale=dct),
        featurize)
    imp = common.featurize_stacks(
        load_person_stacks([p.impostor for p in people], res,
                           dct_scale=dct), featurize)

    # Pretrain-if-missing (existing_al.py:75-83).
    state = common.new_head_state(next(keys), config.feature_res, 0.1)
    gen = balanced_pair_batches(config.seed, plain, imp, config.batch_size)
    state = common.train_or_load_head(
        state, config.model_path, gen, epochs=config.epochs,
        batch_size=config.batch_size, key=next(keys), n_steps=n_steps,
    )

    strategy = get_strategy(config.query_strategy)
    learner = ActiveLearner(state, strategy, key=next(keys),
                            epochs=config.epochs,
                            batch_size=min(64, config.batch_size))

    # Query/teach loop (existing_al.py:104-118): stream pool batches, pick
    # the most informative pairs, teach on them with their oracle labels.
    queried_total = 0
    budget = int(config.active_ratio * n_rounds * config.batch_size * 0.1)
    for _ in range(n_rounds):
        (left, right), y = next(gen)
        n_pick = max(1, len(y) // 10)
        idx = learner.query(left, right, n_instances=n_pick)
        learner.teach(left[idx], right[idx], y[idx], only_new=True)
        queried_total += n_pick
        if queried_total >= budget:
            break
    T.save(config.out_model, learner.state.params)
    return learner


def main(argv=None) -> None:
    config = parse_config(argv, config_cls=ExistingALConfig)
    run_existing_al(config)


if __name__ == "__main__":
    main()
