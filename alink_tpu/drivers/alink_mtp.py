"""A-LINK driver — Multi-PIE cross-resolution variant.

Reference: ``code/ALINK_MTP.py`` — the domain gap is *resolution*: the
teacher committee works on 2048-d features of high-resolution faces while
the student is the raw-pixel ``SmallRes`` twin tower at ``--lowRes``
(default 48) (ALINK_MTP.py:36-43, 55, 107).  Differences from the DFW
driver, all reproduced here:

- pair pool: one group of subjects, all-pairs within the slab
  (``readMTP.createMiniBatch``, single-group grid);
- noise bank defaults to the adversarial channel only (ALINK_MTP.py:53);
- noisy pairs are resized to lowRes for the student (ALINK_MTP.py:164-165);
- the driver ends with the gallery top-1 identification evaluation
  (ALINK_MTP.py:271-289) — the only in-driver eval in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alink_tpu import train as T
from alink_tpu.active.loop import ALinkLoop, ALinkState
from alink_tpu.config import MTPConfig
from alink_tpu.data import (
    balanced_pair_batches,
    load_person_stacks,
    mtp_all_pairs_index,
    scan_mtp,
    split_disguise_data,
)
from alink_tpu.drivers import common
from alink_tpu.drivers.alink import parse_config
from alink_tpu.evaluation import gallery_top1
from alink_tpu.models import SmallRes, preprocess
from alink_tpu.ops.image import resize


def make_smallres_state(key, config: MTPConfig) -> T.TrainState:
    """The low-res student (ALINK_MTP.py:107: SmallRes at lowRes)."""
    model = SmallRes(feature_dim=config.feature_res)
    s = config.low_res
    return T.create_train_state(
        model, key, jnp.zeros((2, s, s, 3)), jnp.zeros((2, s, s, 3)),
        learning_rate=0.1,
    )


def smallres_score_fn(state: T.TrainState, low_res: int,
                      probe_chunk: int = 32):
    """(probes, gallery) -> (N, G) genuine scores for the top-1 eval.

    Chunked over probes: one call materialises ``probe_chunk * G`` image
    pairs at a time instead of the full N x G grid (Multi-PIE scale:
    ~1000 probes x ~337 gallery x two 48 px images would be ~19 GB in
    one shot).  ``low_res`` documents the expected input resolution.
    """
    del low_res  # images arrive already at the student resolution

    def score(probes, gallery):
        probes = jnp.asarray(probes)
        gallery = jnp.asarray(gallery)
        n, g = probes.shape[0], gallery.shape[0]
        pg = preprocess.smallres(gallery)
        rows = []
        for s in range(0, n, probe_chunk):
            pc = probes[s:s + probe_chunk]
            k = pc.shape[0]
            pl = jnp.repeat(preprocess.smallres(pc), g, axis=0)
            gr = jnp.tile(pg, (k, 1, 1, 1))
            logits = state.logits_fn(state.params, pl, gr)
            rows.append(jax.nn.softmax(logits, axis=-1)[:, 1].reshape(k, g))
        return jnp.concatenate(rows, axis=0)

    return score


def run_alink_mtp(
    config: MTPConfig,
    *,
    featurize=None,
    n_steps: int | None = None,
    key: jax.Array | None = None,
) -> tuple[ALinkState, float | None]:
    """ALINK_MTP.py main flow; returns (loop state, top-1 accuracy).

    ``n_steps`` defaults to ``config.train_steps`` (the reference's
    hard-coded 320000 samples/epoch).
    """
    if n_steps is None:
        n_steps = config.train_steps
    key = key if key is not None else jax.random.PRNGKey(config.seed)
    keys = iter(jax.random.split(key, 16))

    if featurize is None:
        featurize, _ = common.make_resnet50_featurizer(
            next(keys),
            scan_units=getattr(config, 'featurize_scan_units', False))

    # Subject pool (readMTP.readAllImages) at teacher resolution.
    groups = scan_mtp(config.data_dir_prefix)
    dct = config.ingest_dct_scale
    hi = load_person_stacks(list(groups.values()),
                            tuple(config.image_res), dct_scale=dct)
    lo = load_person_stacks(list(groups.values()),
                            (config.low_res, config.low_res),
                            dct_scale=dct)

    # Student pretraining pool / unlabeled pool split (split_ratio).
    lo_pre, _ = split_disguise_data(lo, config.split_ratio)
    _, hi_post = split_disguise_data(hi, config.split_ratio)

    # Student M2: SmallRes on raw low-res pixels (scaled by its
    # (x-128)/128 preprocess, siamese.py:179-181).
    m2 = make_smallres_state(next(keys), config)
    m2_gen = (
        ((preprocess.smallres(l), preprocess.smallres(r)), y)
        for (l, r), y in balanced_pair_batches(
            config.seed, lo_pre, None, config.batch_size)
    )
    params, ok = T.maybe_restore(config.lowres_basemodel, m2.params)
    if ok:
        m2 = m2.replace(params=params)
    else:
        m2, _ = T.custom_train(
            m2, m2_gen, epochs=config.lowres_epochs,
            batch_size=config.batch_size, key=next(keys), n_steps=n_steps,
        )
        T.save(config.lowres_basemodel, m2.params)

    # Teacher committee on high-res features, trained as one vmapped
    # program (train/ensemble.py).
    hi_feats = common.featurize_stacks(hi, featurize)
    feat_gen = common.replay_generator(config.seed + 1, hi_feats, None,
                                       config.batch_size)
    committee, head = common.train_or_load_committee(
        next(keys), config.feature_res, config.noise,
        config.num_ensemble_models, config.ensemble_basepath, feat_gen,
        epochs=config.highres_epochs, batch_size=config.batch_size,
        refine=config.refine_models, n_steps=n_steps,
    )

    # Replay stream in student space (low-res scaled pixels).
    replay = (
        ((preprocess.smallres(l), preprocess.smallres(r)), y)
        for (l, r), y in balanced_pair_batches(
            config.seed + 2, lo, None, config.batch_size)
    )

    def adversarial_predict(m2_params, left, right):
        ll = preprocess.smallres(resize(left, (config.low_res,
                                               config.low_res)))
        rr = preprocess.smallres(resize(right, (config.low_res,
                                                config.low_res)))
        logits = m2.logits_fn(m2_params, ll, rr)
        return jax.nn.softmax(logits, axis=-1)

    loop = ALinkLoop(
        config,
        pool_uint8=True,
        featurize=featurize,
        committee=committee,
        m2_state=m2,
        student_featurize=preprocess.smallres,
        student_is_head=False,
        student_res=(config.low_res, config.low_res),
        replay_gen=replay,
        adversarial_predict=(
            adversarial_predict
            if {"adversarial", "fgsm"} & set(config.noise) else None),
        pair_builder=lambda plain, _dig: mtp_all_pairs_index(plain),
        key=next(keys),
    )
    state = loop.run(hi_post, hi_post,
                     checkpoint_path=config.loop_checkpoint or None,
                     checkpoint_every=config.checkpoint_every)
    T.save(config.out_model, state.m2_state.params)

    # Gallery top-1 identification tail (ALINK_MTP.py:271-289).
    top1 = None
    try:
        test_groups = scan_mtp(config.test_dir)
    except FileNotFoundError:
        test_groups = {}
    if test_groups:
        test_lo = load_person_stacks(list(test_groups.values()),
                                     (config.low_res, config.low_res),
                                     dct_scale=config.ingest_dct_scale)
        top1 = gallery_top1(
            smallres_score_fn(state.m2_state, config.low_res), test_lo
        )
        print(f">> Top-1 identification accuracy: {top1:.4f}")
    return state, top1


def main(argv=None) -> None:
    config = parse_config(argv, config_cls=MTPConfig)
    run_alink_mtp(config)


if __name__ == "__main__":
    main()
