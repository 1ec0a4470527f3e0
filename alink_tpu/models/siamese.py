"""Siamese verification models (reference: code/siamese.py).

``SiameseHead`` is the verification head used by both M1 (committee) and M2
(student) on top of pre-extracted features:

    L1 = |left - right|                 (code/siamese.py:27-28)
    h  = relu(Dense(512)(L1))           (:29)
    h  = relu(Dense(64)(h))             (:30)
    p  = softmax(Dense(2)(h))           (:31-32)

``head="sigmoid"`` selects the py3 variant (code/siamese3.py): a single
Dense(1) + sigmoid output.

``SmallRes`` is the low-resolution student for the Multi-PIE experiment
(code/siamese.py:134-170): a shared conv tower (32-32-pool-64-64-pool ->
Dense(feature_dim)) on each image, then an L1 head 128 -> 32 -> 2 softmax.

TPU-first departures from the reference:
- pure functional flax modules (explicit params) so the committee can be a
  stacked-params vmap instead of a Python loop over Keras models;
- compute runs in bfloat16 with float32 params/logits (MXU-friendly);
- dropout is stateless (jax.random key threaded through train steps).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SiameseHead(nn.Module):
    """Feature-pair verification head (code/siamese.py:19-35).

    ``widths`` defaults to the DFW configuration (512, 64); the Multi-PIE
    SmallRes head uses (128, 32) (code/siamese.py:164-166).
    """

    widths: Sequence[int] = (512, 64)
    head: str = "softmax"  # "softmax" (siamese.py:31-32) | "sigmoid" (siamese3.py)
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.hidden = [nn.Dense(w, dtype=self.dtype) for w in self.widths]
        self.out = nn.Dense(1 if self.head == "sigmoid" else 2, dtype=jnp.float32)

    def logits(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        """Pre-softmax 2-class logits, for numerically-stable losses."""
        x = jnp.abs(left.astype(self.dtype) - right.astype(self.dtype))
        for layer in self.hidden:
            x = nn.relu(layer(x))
        raw = self.out(x.astype(jnp.float32))
        if self.head == "sigmoid":
            # Export the single sigmoid logit in the 2-class convention so
            # [:, 1] is always P(genuine), matching ALINK.py:175-176:
            # softmax([0, l]) == [1 - sigmoid(l), sigmoid(l)].
            return jnp.concatenate([jnp.zeros_like(raw), raw], axis=-1)
        return raw

    def __call__(self, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
        return nn.softmax(self.logits(left, right), axis=-1)


class SmallResTower(nn.Module):
    """Shared conv tower of the SmallRes student (code/siamese.py:139-156).

    Keras layout: Conv32(3x3, same) relu; Conv32(3x3, valid) relu;
    MaxPool(2); Dropout(.25); Conv64(same) relu; Conv64(valid) relu;
    MaxPool(2); Dropout(.25); Flatten; Dense(feature_dim) relu.
    """

    feature_dim: int = 2048  # ALINK_MTP.py:107 passes GlobalConstants.feature_res
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID", dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.feature_dim, dtype=self.dtype)(x))
        return x.astype(jnp.float32)


class SmallRes(nn.Module):
    """Twin-tower siamese over raw low-res images (code/siamese.py:134-170).

    Head widths are (128, 32) per code/siamese.py:164-166.  Input is raw
    pixels; callers apply ``preprocess.smallres`` first, matching
    code/siamese.py:179-184.
    """

    feature_dim: int = 2048
    head: str = "softmax"
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.tower = SmallResTower(self.feature_dim, dtype=self.dtype)
        self.verify_head = SiameseHead(
            widths=(128, 32), head=self.head, dtype=self.dtype
        )

    def __call__(self, left, right, *, train: bool = False):
        return self.verify_head(
            self.tower(left, train=train), self.tower(right, train=train)
        )

    def logits(self, left, right, *, train: bool = False):
        return self.verify_head.logits(
            self.tower(left, train=train), self.tower(right, train=train)
        )

    def embed(self, x, *, train: bool = False):
        return self.tower(x, train=train)
