"""A-LINK / A2-LINK driver — DFW, VGGFace-ResNet50 configuration.

Reference: ``code/ALINK.py`` (flags :37-62, main :65-265).  Same staging:

1. featurize DFW person stacks with the 2048-d teacher backbone;
2. split the disguised pool (``--split_ratio``) into an M2-pretraining half
   and the unlabeled loop pool;
3. train-or-load the student M2 (``--train_disguised_model`` forces a
   (re)train+save; the reference additionally exits afterwards,
   ALINK.py:108-110 — here the run simply continues) and the M1 ensemble
   (``--refine_models``);
4. run the A-LINK loop (active.loop) and save the post-A-LINK model.

Usage (flag names 1:1 with the reference):
    python -m alink_tpu.drivers.alink --data_dir_prefix DFW_Data/ ...
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

from alink_tpu import train as T
from alink_tpu.active.loop import ALinkLoop, ALinkState
from alink_tpu.config import ALinkConfig
from alink_tpu.drivers import common
from alink_tpu.ops.pairwise import pair_scores


def _is_int_or_str(annotation) -> bool:
    """True for an ``int | str`` (or ``Union[int, str]``) annotation."""
    import typing

    return {int, str} <= set(typing.get_args(annotation))


def add_config_flags(parser: argparse.ArgumentParser, config_cls) -> None:
    """argparse flags from the config dataclass (names match ALINK.py:37-62)."""
    import typing

    hints = typing.get_type_hints(config_cls)
    for field in dataclasses.fields(config_cls):
        default = field.default
        if isinstance(default, bool):
            parser.add_argument(f"--{field.name}", type=lambda s: s.lower()
                                in ("1", "true", "yes"), default=default)
        elif _is_int_or_str(hints.get(field.name)):
            # Declared ``int | str`` (e.g. device_batch): accepts an int
            # or a literal keyword such as "auto" (the dispatch-latency
            # probe, config.py) — a plain int(default) type would make
            # the keyword unreachable from the CLI.
            parser.add_argument(
                f"--{field.name}",
                type=lambda s: int(s) if s.lstrip("-").isdigit() else s,
                default=default)
        elif isinstance(default, (int, float, str)):
            parser.add_argument(f"--{field.name}", type=type(default),
                                default=default)
        elif field.name == "noise":
            parser.add_argument("--noise", type=str,
                                default=",".join(default))


def parse_config(argv=None, config_cls=ALinkConfig,
                 **overrides) -> ALinkConfig:
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_flags(parser, config_cls)
    args = vars(parser.parse_args(argv))
    if isinstance(args.get("noise"), str):
        args["noise"] = tuple(args["noise"].split(","))
    known = {f.name for f in dataclasses.fields(config_cls)}
    args = {k: v for k, v in args.items() if k in known}
    args.update(overrides)
    return config_cls(**args)


def make_adversarial_predict(featurize):
    """End-to-end PredictionWrappedModel (noise.py:153-168): raw pair
    halves -> features -> M2 probabilities, parameterised by M2 params."""

    def predict(m2_params, left, right):
        import jax.numpy as jnp

        p = pair_scores(m2_params, featurize(left), featurize(right))
        return jnp.stack([1.0 - p, p], axis=-1)

    return predict


def run_alink(
    config: ALinkConfig,
    *,
    featurize=None,
    n_steps: int | None = None,
    key: jax.Array | None = None,
) -> ALinkState:
    """The full ALINK.py main flow; returns the final loop state.

    ``n_steps`` (samples per pretraining epoch) defaults to
    ``config.train_steps`` — the reference's hard-coded 320000.
    """
    if n_steps is None:
        n_steps = config.train_steps
    key = key if key is not None else jax.random.PRNGKey(config.seed)
    keys = iter(jax.random.split(key, 16))

    if config.synthetic_people:
        # Demo mode: fabricate a DFW-protocol tree and point the run at
        # it (every downstream path — scan, decode, featurize, loop,
        # eval — is the production one).
        import tempfile

        from alink_tpu.data import make_synthetic_dfw

        root = tempfile.mkdtemp(prefix="alink_synth_")
        make_synthetic_dfw(root, num_people=config.synthetic_people,
                           image_size=config.image_res[0],
                           train_folder=config.train_images_dir,
                           seed=config.seed)
        config = dataclasses.replace(config, data_dir_prefix=root)
        print(f"synthetic DFW tree: {root} "
              f"({config.synthetic_people} people)")

    if featurize is None:
        featurize, _ = common.make_resnet50_featurizer(
            next(keys),
            scan_units=getattr(config, 'featurize_scan_units', False))

    data = common.load_dfw(config, featurize)
    dig_pre, dig_post_raw = common.split_pools(config, data)

    # Student M2 (ALINK.py:88, 99-118).
    m2 = common.new_head_state(next(keys), config.feature_res, 0.1)
    m2_gen = common.replay_generator(config.seed, dig_pre, data.imp_feats,
                                    config.batch_size)
    m2 = common.train_or_load_head(
        m2, config.disguised_basemodel, m2_gen,
        epochs=config.dig_epochs, batch_size=config.batch_size,
        key=next(keys), refine=config.train_disguised_model, n_steps=n_steps,
    )

    # M1 ensemble (ALINK.py:94-97, 122-132): the whole committee trains as
    # one vmapped program (train/ensemble.py) on undisguised pairs, with
    # per-member checkpoints for train-or-load staging.
    plain_gen = common.replay_generator(config.seed + 1, data.plain_feats,
                                        data.imp_feats, config.batch_size)
    committee, head = common.train_or_load_committee(
        next(keys), config.feature_res, config.noise,
        config.num_ensemble_models, config.ensemble_basepath, plain_gen,
        epochs=config.undig_epochs, batch_size=config.batch_size,
        refine=config.refine_models, n_steps=n_steps,
    )

    # Framework loop (ALINK.py:145-259).
    # Both model-backed channels (DE one-pixel AND fgsm) need the
    # end-to-end predict fn — gating on "adversarial" alone would crash
    # Committee.attack_model on the first selection round of an
    # fgsm-only bank.
    adv = (make_adversarial_predict(featurize)
           if {"adversarial", "fgsm"} & set(config.noise) else None)
    loop_key = next(keys)

    def attempt(attempt_idx: int) -> ALinkState:
        # A fresh replay generator per attempt: the loop's RNG-exact
        # restore fast-forwards it to the checkpointed position, which a
        # partially consumed generator from a failed attempt cannot
        # rewind to (utils/resilience.py).
        replay = common.replay_generator(config.seed + 2, data.plain_feats,
                                         data.imp_feats, config.batch_size)
        loop = ALinkLoop(
            config,
            pool_uint8=True,
            featurize=featurize,
            committee=committee,
            m2_state=m2,
            replay_gen=replay,
            adversarial_predict=adv,
            key=loop_key,
        )
        return loop.run(data.plain_raw, dig_post_raw,
                        checkpoint_path=config.loop_checkpoint or None,
                        checkpoint_every=config.checkpoint_every)

    if config.max_restarts > 0:
        # Supervised restarts (SURVEY.md section 5.3): retryable runtime
        # faults resume from loop_checkpoint with the trajectory intact.
        if not config.loop_checkpoint:
            raise ValueError("max_restarts requires loop_checkpoint")
        from alink_tpu.utils import run_with_retries

        state = run_with_retries(attempt, max_restarts=config.max_restarts)
    else:
        state = attempt(0)
    print(f">> Active Count: {state.active_count} out of {state.un_size}")
    T.save(config.out_model, state.m2_state.params)
    return state


def main(argv=None) -> None:
    # Multi-host bring-up (no-op single-process; SURVEY.md section 2.4).
    from alink_tpu.parallel import initialize

    initialize()
    config = parse_config(argv)
    run_alink(config)


if __name__ == "__main__":
    main()
