"""Adversarial attacks: one-pixel DE attack and FGSM, batched on device.

Reference: code/attack.py + code/noise.py:153-188.  The reference attacks
each pair serially (attack.py:94-101), re-crossing the Python<->GPU boundary
``maxiter x popsize`` times per pair (SURVEY.md section 3.1).  Here the DE
solver is vmapped over the pair batch, so every generation is one batched
model forward for all pairs' whole populations.

Reference semantics preserved:

- search space per pixel is a flat ``[x, y, r, g, b]`` 5-tuple, bounds
  ``(0, dim_x), (0, dim_y), (0, 256)^3`` repeated ``pixel_count`` times
  (attack.py:65-68);
- perturbation floors coordinates to ints and overwrites the pixel's RGB
  (attack.py:17-27; note the reference indexes ``img[x_pos, y_pos]``, i.e.
  the first bound runs over rows);
- DE config from attack_all: pixel_count=40, maxiter=50, popsize=250 ->
  ``popmul = max(1, popsize // (5 * pixel_count))``, recombination=1,
  atol=-1, polish off (attack.py:71, 81-83, 91);
- target direction: ``attack_all`` runs a TARGETED attack toward
  ``argmax(m1_label)`` — it passes ``target=target_class`` so
  ``targeted_attack=True`` and ``minimize=False`` returns
  ``1 - P(target)`` for DE to minimise, i.e. the solver *maximises* the
  student's probability of M1's label (attack.py:37-42, 63, 74-75,
  96-97; the ``1 - target_class`` it passes as ``actual_class`` is dead
  on this path, :63).  Counterintuitive for an "adversarial" channel,
  but it is what the reference computes — pairs where the student
  resists agreeing with M1 even under attack carry the strongest
  disagreement signal;
- early stop per pair when the model's argmax already equals the target
  class (attack_success with targeted_attack=True, attack.py:44-57) —
  the common case, since M2 usually agrees with M1;
- the pair is attacked as one vertically concatenated 2HxW image and split
  back into halves (noise.py:178-188).

``fgsm`` is the gradient-sign attack listed in BASELINE.json's scope —
free in JAX since the model is differentiable.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from alink_tpu.ops.de import differential_evolution


def perturb_image(xs: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Apply flat ``[x, y, r, g, b] * k`` perturbation vectors to one image.

    Reference: attack.py:5-29.  ``xs``: (..., 5k) float; coordinates are
    floored to ints; each pixel's RGB is overwritten.  Returns images with
    ``xs``'s leading shape prepended.

    TPU formulation: the per-candidate pixel writes are expressed as
    one-hot row/column outer products contracted on the MXU (three einsums)
    instead of scatters — 16x faster on TPU, since the DE inner loop calls
    this once per generation for the whole population.  Sole deviation
    from the reference loop: when one candidate addresses the same pixel
    twice, the written value is the mean of its writes rather than the
    last (a measure-zero event in the random search).
    """
    lead = xs.shape[:-1]
    flat = xs.reshape((-1, xs.shape[-1])).astype(jnp.int32)
    n, k5 = flat.shape
    k = k5 // 5
    px = flat.reshape(n, k, 5)
    rows = jnp.clip(px[:, :, 0], 0, img.shape[0] - 1)
    cols = jnp.clip(px[:, :, 1], 0, img.shape[1] - 1)
    rgb = px[:, :, 2:5].astype(jnp.float32)

    oh_r = jax.nn.one_hot(rows, img.shape[0], dtype=jnp.float32)  # (n,k,H)
    oh_c = jax.nn.one_hot(cols, img.shape[1], dtype=jnp.float32)  # (n,k,W)
    vals = jnp.einsum("nkh,nkw,nkc->nhwc", oh_r, oh_c, rgb)
    hits = jnp.einsum("nkh,nkw->nhw", oh_r, oh_c)[..., None]
    out = (img.astype(jnp.float32) * jnp.maximum(1.0 - hits, 0.0)
           + vals / jnp.maximum(hits, 1.0))
    return out.astype(img.dtype).reshape(lead + img.shape)


@partial(
    jax.jit,
    static_argnames=("predict_fn", "pixel_count", "maxiter", "popsize"),
)
def one_pixel_attack_pairs(
    predict_fn: Callable[[object, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    predict_params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    target_labels: jnp.ndarray,
    key: jax.Array,
    *,
    pixel_count: int = 40,
    maxiter: int = 50,
    popsize: int = 250,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """A2-LINK's adversarial channel over a whole pair batch.

    Args:
        predict_fn: ``(params, left, right) -> (N, 2) probabilities`` — the
            end-to-end model (featurizer + siamese head), i.e.
            PredictionWrappedModel (noise.py:153-168).  Static for jit
            caching; the mutable model state flows through
            ``predict_params`` so A-LINK's per-round finetunes don't
            trigger recompilation.
        predict_params: pytree passed through to ``predict_fn`` (traced).
        left/right: (N, H, W, C) raw pair halves.
        target_labels: (N, 2) one-hot M1 labels; the attack drives the model
            toward class ``argmax`` of these (ALINK.py:163-164 passes
            m1_labels and attack_all flips to target the *other* class's
            misclassification, attack.py:96-97).
        key: PRNG key.

    Returns the perturbed (left, right) halves, same shapes as the inputs.
    """
    n, h, w, c = left.shape
    dim_x, dim_y = 2 * h, w  # concatenated pair image (noise.py:181-183)
    bounds = jnp.tile(
        jnp.asarray(
            [[0, dim_x], [0, dim_y], [0, 256], [0, 256], [0, 256]], jnp.float32
        ),
        (pixel_count, 1),
    )
    popmul = max(1, popsize // (5 * pixel_count))  # attack.py:71

    concat = jnp.concatenate([left, right], axis=1)  # (N, 2H, W, C)
    target_class = jnp.argmax(target_labels, axis=-1)  # attack.py:96

    def predict_concat(imgs: jnp.ndarray) -> jnp.ndarray:
        """Split stacked pair images and run the end-to-end model
        (noise.py:158-168)."""
        lh = imgs[:, :h]
        rh = imgs[:, h:]
        return predict_fn(predict_params, lh, rh)

    def attack_one(img, tclass, k):
        def fitness(params):  # (M, 5k) -> (M,)
            imgs = perturb_image(params, img)
            probs = predict_concat(imgs)
            # attack_all passes target=argmax(m1_label) (attack.py:96-97),
            # making predict_classes minimise 1 - p[target] (attack.py:42):
            # the attack drives M2 toward M1's label.
            return 1.0 - probs[:, tclass]

        def success(x):  # attack_success (attack.py:44-57), targeted branch
            probs = predict_concat(perturb_image(x[None], img))[0]
            return jnp.argmax(probs) == tclass

        result = differential_evolution(
            fitness,
            bounds,
            k,
            maxiter=maxiter,
            popsize=popmul,
            recombination=1.0,
            atol=-1.0,
            early_stop_fn=success,
        )
        return perturb_image(result.x[None], img)[0]

    perturbed = jax.vmap(attack_one)(concat, target_class, jax.random.split(key, n))
    return perturbed[:, :h], perturbed[:, h:]


@partial(
    jax.jit,
    static_argnames=("predict_fn", "proxy_hw", "pixel_count", "maxiter",
                     "popsize"),
)
def one_pixel_attack_pairs_proxy(
    predict_fn: Callable[[object, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    predict_params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    target_labels: jnp.ndarray,
    key: jax.Array,
    *,
    proxy_hw: tuple[int, int] = (56, 56),
    pixel_count: int = 40,
    maxiter: int = 50,
    popsize: int = 250,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Low-resolution surrogate for ``one_pixel_attack_pairs`` (opt-in).

    Greenfield economics fix (no reference counterpart): the exact
    DE channel costs ``maxiter x popsize`` full-resolution model
    forwards per pair — ~1.6 TFLOP/eval through a 224² ResNet50
    (BENCHMARKS.md "adversarial channel"), unusable off the early-stop
    path.  The surrogate runs the whole DE search at ``proxy_hw``
    (model FLOPs scale with pixel count: 16x cheaper at 56² from 224²),
    maps the winning perturbation back to full resolution (each proxy
    pixel becomes its sy x sx block), and spends ONE full-resolution
    forward per pair verifying transfer: pairs where the upscaled
    perturbation does not reproduce the targeted misclassification
    fall back to their unattacked halves, so the channel never emits an
    attack that full-resolution inference disproves.

    Semantics differ from the exact channel (the search explores a
    coarser pixel grid and a 1/16-cost model view) — off by default;
    enable by passing ``proxy_hw`` in ``ALinkLoop(adversarial_kwargs=)``.

    ``proxy_hw`` must divide the pair resolution elementwise, and
    ``predict_fn`` must accept the proxy resolution (fully-convolutional
    + pooled students do; a fixed-dim raw-flatten head does not — keep
    the exact channel for those).
    """
    from alink_tpu.ops.image import resize

    n, h, w, c = left.shape
    ph, pw = proxy_hw
    if h % ph or w % pw:
        raise ValueError(f"proxy_hw {proxy_hw} must divide ({h}, {w})")
    sy, sx = h // ph, w // pw

    pl_ = resize(left, (ph, pw))
    pr_ = resize(right, (ph, pw))
    al, ar = one_pixel_attack_pairs(
        predict_fn, predict_params, pl_, pr_, target_labels, key,
        pixel_count=pixel_count, maxiter=maxiter, popsize=popsize)

    def inject(full, proxy_orig, proxy_att):
        changed = jnp.any(proxy_att != proxy_orig, axis=-1, keepdims=True)
        up_mask = jnp.repeat(jnp.repeat(changed, sy, 1), sx, 2)
        up_vals = jnp.repeat(jnp.repeat(proxy_att, sy, 1), sx, 2)
        return jnp.where(up_mask, up_vals.astype(full.dtype), full)

    fl = inject(left, pl_, al)
    fr = inject(right, pr_, ar)
    # One full-resolution verification forward per pair.
    probs = predict_fn(predict_params, fl, fr)
    tclass = jnp.argmax(target_labels, axis=-1)
    ok = (jnp.argmax(probs, axis=-1) == tclass)[:, None, None, None]
    return jnp.where(ok, fl, left), jnp.where(ok, fr, right)


@partial(jax.jit, static_argnames=("predict_fn",))
def fgsm_pairs(
    predict_fn: Callable[[object, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    predict_params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    target_labels: jnp.ndarray,
    epsilon: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Targeted fast gradient-sign attack on a pair batch (BASELINE.json
    scope: "FGSM + DE one-pixel" as A2-LINK adversarial channels).

    TARGETED, matching the DE channel's semantics (attack.py:96-97 via
    ``one_pixel_attack_pairs``): both halves move by
    ``-epsilon * sign(grad)`` of the cross-entropy against
    ``target_labels`` — *descending* the loss, i.e. pushing the model
    TOWARD those labels (the committee passes M1's labels,
    committee.py:attack_model), in raw pixel units ([0, 255] images).
    The selection signal is then pairs whose student RESISTS agreeing
    with M1 under attack — the same criterion as the DE channel; an
    ascending FGSM would manufacture disagreement on every pair and
    invert the channel's meaning.
    """

    def xent(lh, rh):
        probs = predict_fn(predict_params, lh, rh)
        eps = 1e-12
        return -jnp.mean(jnp.sum(target_labels * jnp.log(probs + eps), axis=-1))

    gl, gr = jax.grad(xent, argnums=(0, 1))(left, right)
    return left - epsilon * jnp.sign(gl), right - epsilon * jnp.sign(gr)
