"""Identification-head classification models (reference: code/model.py).

The reference's side-path classifiers (not imported by the A-LINK drivers,
model.py is legacy/experimental per SURVEY.md section 2.1) put a softmax
identification head on each backbone:

- ``VGG16Classifier``    — pool5 -> fc6/fc7 (hid_dim, relu) -> softmax
  (model.py:85-103);
- ``ResNet50Classifier`` — avg_pool flatten -> softmax (model.py:106-123);
- ``SENet50Classifier``  — same over SENet50 (model.py:126-141);
- ``SmallResClassifier`` — the SmallRes conv tower -> Dense 512 ->
  Dropout(.5) -> softmax (model.py:144-176).

All emit logits via ``logits`` (softmax applied in ``__call__``), trained
with categorical cross-entropy + the standard EarlyStopping schedule via
``train.classifier``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from alink_tpu.models.resnet import SENet50, VGGFace16, VGGFaceResNet50


class _BackboneClassifier(nn.Module):
    """Backbone features -> optional hidden MLP -> out_dim logits."""

    backbone: nn.Module
    out_dim: int
    hidden: tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def _logits(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        del train
        h = self.backbone(x)
        for w in self.hidden:
            h = nn.relu(nn.Dense(w, dtype=self.dtype)(h)).astype(jnp.float32)
        return nn.Dense(self.out_dim, dtype=jnp.float32)(h)

    def logits(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self._logits(x, train)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return nn.softmax(self._logits(x, train), axis=-1)


def VGG16Classifier(out_dim: int, hid_dim: int = 512,
                    dtype=jnp.bfloat16) -> _BackboneClassifier:
    """fc6/fc7 MLP head over VGG16 pool5 (model.py:85-103)."""
    return _BackboneClassifier(VGGFace16(dtype=dtype), out_dim,
                               hidden=(hid_dim, hid_dim), dtype=dtype)


def ResNet50Classifier(out_dim: int, dtype=jnp.bfloat16) -> _BackboneClassifier:
    """Softmax head over ResNet50 avg_pool (model.py:106-123)."""
    return _BackboneClassifier(VGGFaceResNet50(dtype=dtype), out_dim,
                               dtype=dtype)


def SENet50Classifier(out_dim: int, dtype=jnp.bfloat16) -> _BackboneClassifier:
    """Softmax head over SENet50 (model.py:126-141)."""
    return _BackboneClassifier(SENet50(dtype=dtype), out_dim, dtype=dtype)


class SmallResClassifier(nn.Module):
    """Small conv classifier (model.py:144-176): the SmallRes student's
    conv tower (models/siamese.SmallResTower — one source for the shared
    topology) at feature_dim 512 -> Dropout(.5) -> softmax, with the
    (x-128)/128 scaling of preprocess.smallres."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def _logits(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from alink_tpu.models.preprocess import smallres
        from alink_tpu.models.siamese import SmallResTower

        x = SmallResTower(feature_dim=512, dtype=self.dtype)(
            smallres(x), train=train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=jnp.float32)(x)

    def logits(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self._logits(x, train)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return nn.softmax(self._logits(x, train), axis=-1)
