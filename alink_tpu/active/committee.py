"""The M1 committee as a stacked-params vmapped ensemble.

Reference: ``code/committee.py`` — ``Bagging`` holds a Python list of Keras
models and a list of noise objects; ``predict`` averages a Python loop of
``model.predict`` calls (committee.py:13-20) and ``attackModel`` loops the
noise bank over the batch, resizing each result with cv2
(committee.py:28-37).

Here the ensemble lives as **one** parameter pytree with a leading member
axis; prediction is a single ``vmap`` forward (one XLA program for the whole
committee, shardable over the mesh's ``model`` axis), and the noise fan-out
is one batched op per channel.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from alink_tpu.ops import attack as attack_ops
from alink_tpu.ops import noise as noise_ops
from alink_tpu.ops.image import resize


def stack_params(param_trees: Sequence) -> object:
    """Stack E per-member pytrees into one tree with a leading member axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def unstack_params(stacked, index: int):
    """Extract member ``index`` (for per-member checkpointing/training)."""
    return jax.tree.map(lambda x: x[index], stacked)


class Committee:
    """Ensemble of siamese verification heads (Bagging, committee.py:7-37).

    Args:
        head: the shared flax module (e.g. ``SiameseHead``).
        stacked_params: params pytree with a leading ensemble axis E.
        noise_names: the noise bank, e.g. ("gaussian", ..., "adversarial")
            (ALINK.py:43, ALINK_arc.py:41).
    """

    def __init__(self, head, stacked_params, noise_names: Sequence[str] = ()):
        self.head = head
        self.params = stacked_params
        self.noise_names = tuple(noise_names)

    @classmethod
    def from_param_list(cls, head, param_trees, noise_names=()):
        return cls(head, stack_params(param_trees), noise_names)

    @property
    def num_members(self) -> int:
        return jax.tree.leaves(self.params)[0].shape[0]

    def member_params(self, index: int):
        return unstack_params(self.params, index)

    def predict(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """Mean ensemble probabilities (committee.py:13-20): (N, 2)."""
        return self.predict_with(self.params, left, right)

    def predict_with(self, stacked_params, left, right) -> jnp.ndarray:
        """``predict`` with explicitly-threaded params — for callers that
        trace the committee inside a larger jitted program and must pass
        params as arguments rather than capture them as constants
        (active/loop.py's fused chunk)."""
        return _committee_predict(self.head, stacked_params, left, right)

    def member_probs(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """(E, N, 2) per-member probabilities (Committee.vote_proba path,
        learners.py:340-370)."""
        return _member_probs(self.head, self.params, left, right)

    def attack_model(
        self,
        key: jax.Array,
        left: jnp.ndarray,
        right: jnp.ndarray,
        target_res: tuple[int, int],
        m1_labels: jnp.ndarray | None = None,
        adversarial_predict: Callable | None = None,
        adversarial_params=None,
        adversarial_kwargs: dict | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fan the noise bank over a raw pair batch (attackModel,
        committee.py:28-37): returns (K, N, H', W', C) left/right stacks
        resized to ``target_res``, channels ordered as ``noise_names``.

        The adversarial channel (noise.py:171-188) needs the student model:
        pass its end-to-end ``(params, left, right) -> (N, 2)`` probability
        fn as ``adversarial_predict`` (static), the live model state as
        ``adversarial_params`` (traced), and the committee's one-hot
        ``m1_labels`` (ALINK.py:163-164).
        """
        model_channels = ("adversarial", "fgsm")
        plain_names = tuple(n for n in self.noise_names
                            if n not in model_channels)
        outs_l, outs_r = [], []
        if plain_names:
            kb, key = jax.random.split(key)
            ls, rs = noise_ops.apply_noise_bank(plain_names, kb, left, right)
            for i in range(len(plain_names)):
                outs_l.append(ls[i])
                outs_r.append(rs[i])
        by_name = dict(zip(plain_names, range(len(plain_names))))
        ordered_l, ordered_r = [], []
        for name in self.noise_names:
            if name in model_channels:
                if adversarial_predict is None or m1_labels is None:
                    raise ValueError(
                        f"{name} channel requires adversarial_predict "
                        "and m1_labels"
                    )
                if name == "adversarial":
                    ka, key = jax.random.split(key)
                    akw = dict(adversarial_kwargs or {})
                    # proxy_hw opts into the low-res DE surrogate with
                    # full-res transfer verification (ops/attack.py).
                    attack = (attack_ops.one_pixel_attack_pairs_proxy
                              if "proxy_hw" in akw
                              else attack_ops.one_pixel_attack_pairs)
                    al, ar = attack(
                        adversarial_predict, adversarial_params, left, right,
                        m1_labels, ka, **akw,
                    )
                else:  # fgsm (BASELINE.json scope: FGSM + DE one-pixel)
                    al, ar = attack_ops.fgsm_pairs(
                        adversarial_predict, adversarial_params, left, right,
                        m1_labels,
                    )
                ordered_l.append(al)
                ordered_r.append(ar)
            else:
                ordered_l.append(outs_l[by_name[name]])
                ordered_r.append(outs_r[by_name[name]])
        stacked_l = jnp.stack(ordered_l)
        stacked_r = jnp.stack(ordered_r)
        k, n = stacked_l.shape[0], stacked_l.shape[1]
        if tuple(target_res) == stacked_l.shape[2:4]:
            # Same-resolution student (the DFW drivers): cv2.resize to the
            # identical size is the identity — skip the bilinear pass
            # entirely instead of resampling gigabytes per round.
            return stacked_l, stacked_r
        flat_l = stacked_l.reshape((k * n,) + stacked_l.shape[2:])
        flat_r = stacked_r.reshape((k * n,) + stacked_r.shape[2:])
        rl = resize(flat_l, target_res)
        rr = resize(flat_r, target_res)
        return (
            rl.reshape((k, n) + rl.shape[1:]),
            rr.reshape((k, n) + rr.shape[1:]),
        )


@partial(jax.jit, static_argnames=("head",))
def _member_probs(head, stacked_params, left, right):
    return jax.vmap(lambda p: head.apply(p, left, right))(stacked_params)


@partial(jax.jit, static_argnames=("head",))
def _committee_predict(head, stacked_params, left, right):
    return jnp.mean(_member_probs(head, stacked_params, left, right), axis=0)
