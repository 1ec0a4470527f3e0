"""Shared driver wiring: data staging, featurizers, train-or-load models.

Mirrors the setup phase every reference driver repeats
(``code/ALINK.py:65-143``): read DFW, featurize person stacks, split the
disguised pool, train-or-load the student and the committee, build the
balanced replay generator.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu import train as T
from alink_tpu.active.committee import Committee
from alink_tpu.config import ALinkConfig
from alink_tpu.data import (
    PersonStacks,
    balanced_pair_batches,
    load_person_stacks,
    scan_dfw,
    split_disguise_data,
)
from alink_tpu.models import SiameseHead, VGGFaceResNet50, preprocess


@dataclasses.dataclass
class DFWData:
    """Featurized + raw DFW person stacks (getAllTrainData/getRawTrainData)."""

    plain_feats: PersonStacks
    dig_feats: PersonStacks
    imp_feats: PersonStacks
    plain_raw: PersonStacks
    dig_raw: PersonStacks


def make_resnet50_featurizer(
    key: jax.Array, params=None, dtype=jnp.bfloat16,
    scan_units: bool = False
) -> tuple[Callable, dict]:
    """The VGGFace-ResNet50 2048-d teacher featurizer (siamese.py:203-216),
    jit'd with its preprocessing fused in.  Random params unless given
    (pretrained weights restore via train.checkpoint).  ``scan_units``
    compiles each residual stage as one scan body (fast cold start);
    unrolled-layout ``params`` convert automatically."""
    model = VGGFaceResNet50(dtype=dtype, scan_units=scan_units)
    if params is None:
        params = model.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
    elif scan_units:
        from alink_tpu.models import stack_bottleneck_params

        params = stack_bottleneck_params(params, model.stage_sizes)

    @jax.jit
    def featurize(images):
        return model.apply(params, preprocess.vggface(images, version=2))

    return featurize, params


def featurize_stacks(stacks: PersonStacks, featurize, batch: int = 256
                     ) -> PersonStacks:
    """Batched replacement for the per-person model.process calls
    (readDFW.py:99-101): one padded pass over all images."""

    def run(flat):
        if flat.shape[0] == 0:
            # Zero images (e.g. a group the scan found empty): one
            # zero-batch call still yields the right feature shape.
            return np.asarray(featurize(jnp.asarray(flat)))
        outs = []
        for i in range(0, flat.shape[0], batch):
            outs.append(np.asarray(featurize(jnp.asarray(flat[i:i + batch]))))
        return np.concatenate(outs)

    return stacks.map_stacks(run)


def load_dfw(
    config: ALinkConfig, featurize: Callable
) -> DFWData:
    """Scan + decode + featurize the DFW training tree
    (ALINK.py:69-77: getAllTrainData + getRawTrainData)."""
    people = scan_dfw(config.data_dir_prefix, config.train_images_dir)
    if not people:
        raise FileNotFoundError(
            "no DFW persons with plain + disguised (_h_) + impostor (_I_) "
            f"images found under "
            f"{os.path.join(config.data_dir_prefix, config.train_images_dir)}"
        )
    res = tuple(config.image_res)
    dct = getattr(config, "ingest_dct_scale", False)
    plain_raw = load_person_stacks([p.plain for p in people], res,
                                   dct_scale=dct)
    dig_raw = load_person_stacks([p.disguised for p in people], res,
                                 dct_scale=dct)
    imp_raw = load_person_stacks([p.impostor for p in people], res,
                                 dct_scale=dct)
    return DFWData(
        plain_feats=featurize_stacks(plain_raw, featurize),
        dig_feats=featurize_stacks(dig_raw, featurize),
        imp_feats=featurize_stacks(imp_raw, featurize),
        plain_raw=plain_raw,
        dig_raw=dig_raw,
    )


def split_pools(config: ALinkConfig, data: DFWData):
    """Pre/post disguise split (ALINK.py:78-86): featurized pre-pool for M2
    pretraining, raw post-pool for the selection loop."""
    dig_pre, _ = split_disguise_data(data.dig_feats, config.split_ratio)
    _, dig_post_raw = split_disguise_data(data.dig_raw, config.split_ratio)
    return dig_pre, dig_post_raw


def new_head_state(
    key: jax.Array, feature_dim: int, learning_rate: float = 0.1
) -> T.TrainState:
    """A SiameseNetwork-equivalent head state (ALINK.py:88: lr 0.1)."""
    head = SiameseHead()
    return T.create_train_state(
        head, key,
        jnp.zeros((2, feature_dim)), jnp.zeros((2, feature_dim)),
        learning_rate=learning_rate,
    )


def train_or_load_head(
    state: T.TrainState,
    path: str,
    gen,
    *,
    epochs: int,
    batch_size: int,
    key: jax.Array,
    refine: bool = False,
    n_steps: int | None = None,
) -> T.TrainState:
    """The maybeLoadFromMemory / customTrainModel / save staging every
    driver repeats (ALINK.py:99-132)."""
    params, ok = T.maybe_restore(path, state.params)
    if ok:
        state = state.replace(params=params)
        if not refine:
            return state
    if not ok or refine:
        state, _ = T.custom_train(
            state, gen, epochs=epochs, batch_size=batch_size, key=key,
            n_steps=n_steps if n_steps is not None else 320000,
        )
        T.save(path, state.params)
    return state


def replay_generator(
    seed: int,
    normal: PersonStacks,
    imp: PersonStacks | None,
    batch_size: int,
):
    """The balanced clean-pair stream mixed into finetuning
    (ALINK.py:115-118, 233-239)."""
    return balanced_pair_batches(seed, normal, imp, batch_size)


def build_committee(
    key: jax.Array,
    feature_dim: int,
    noise_names: Sequence[str],
    num_members: int,
) -> tuple[Committee, SiameseHead]:
    """The M1 ensemble (ALINK.py:94-97) as stacked params."""
    head = SiameseHead()
    params = [
        head.init(jax.random.fold_in(key, i),
                  jnp.zeros((1, feature_dim)), jnp.zeros((1, feature_dim)))
        for i in range(num_members)
    ]
    return Committee.from_param_list(head, params, noise_names), head


def train_or_load_committee(
    key: jax.Array,
    feature_dim: int,
    noise_names: Sequence[str],
    num_members: int,
    basepath: str,
    gen,
    *,
    epochs: int,
    batch_size: int,
    refine: bool = False,
    n_steps: int = 320000,
    learning_rate: float = 0.1,
) -> tuple[Committee, SiameseHead]:
    """Ensemble staging (ALINK.py:122-132) with the whole committee trained
    as ONE vmapped program (train/ensemble.py) instead of the reference's
    sequential per-member fits.  Checkpoint layout stays per-member
    (``<basepath><i>``) so runs interoperate with ``train_or_load_head``.
    """
    from alink_tpu.train.ensemble import create_ensemble_state, train_ensemble
    from alink_tpu.active.committee import stack_params, unstack_params

    head = SiameseHead()
    example = jnp.zeros((2, feature_dim))
    state = create_ensemble_state(head, key, num_members, example, example,
                                  learning_rate=learning_rate)

    restored, oks = [], []
    for i in range(1, num_members + 1):
        member_like = unstack_params(state.params, i - 1)
        params, ok = T.maybe_restore(f"{basepath}{i}", member_like)
        restored.append(params)
        oks.append(ok)
    # Keep every member that DID restore (reference loads or trains
    # per member, ALINK.py:122-132): a save loop interrupted after
    # member k must not throw k checkpoints away and retrain everything.
    # The vmapped trainer runs all members regardless (one program), but
    # restored members' post-training params are overwritten with their
    # checkpointed values before saving, so their checkpoints are stable.
    state = state.replace(params=stack_params(restored))
    if not all(oks) or refine:
        state, _ = train_ensemble(state, gen, epochs=epochs,
                                  batch_size=batch_size, n_steps=n_steps)
        if not refine:
            merged = [restored[i] if oks[i]
                      else unstack_params(state.params, i)
                      for i in range(num_members)]
            state = state.replace(params=stack_params(merged))
        for i in range(1, num_members + 1):
            T.save(f"{basepath}{i}", unstack_params(state.params, i - 1))
    return Committee(head, state.params, noise_names), head
