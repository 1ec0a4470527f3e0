"""Gender/age estimation.

Reference: ``code/face_model.py:95-107`` (``FaceModel.get_ga``) — a
separate MXNet "genderage" checkpoint whose flat output encodes gender as
a 2-way softmax over the first two units and age as the sum of 100 2-way
argmaxes over the remaining 200 units (the InsightFace genderage
convention: out[0:2] -> gender, out[2:202] reshaped (100, 2), age =
sum(argmax, axis=1)).

Two implementations:

- ``GenderAgeResNet50`` — the reference-parity full model: the gamodel
  checkpoint is the same LResNet trunk as the recognition models
  (loaded by the same ``get_model``, face_model.py:52-54), ending in a
  raw 202-d fc1 (no L2 normalisation).  Real checkpoints load via
  ``tools/convert_mxnet.py genderage``.
- ``GenderAgeHead`` — a lightweight greenfield alternative over already-
  computed ArcFace embeddings (one trunk forward serves both tasks).

``decode_ga`` reproduces the reference's output decoding exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from alink_tpu.models.arcface import ArcFaceResNet100


def GenderAgeResNet50(**kwargs) -> ArcFaceResNet100:
    """The genderage network (face_model.py:95-107): LResNet50E trunk to
    a raw (unnormalised) 202-d fc1 output; feed aligned 112x112 chips."""
    kwargs.setdefault("stage_sizes", (3, 4, 14, 3))
    return ArcFaceResNet100(embedding_dim=202, normalize=False, **kwargs)


class GenderAgeHead(nn.Module):
    """(N, D) embeddings -> (N, 202) genderage output vector."""

    hidden: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(
            embeddings.astype(self.dtype)))
        return nn.Dense(202, dtype=jnp.float32)(x.astype(jnp.float32))


def decode_ga(output: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode the 202-d genderage vector (face_model.py:95-107).

    Returns (gender (N,) int {0, 1}, age (N,) int 0..100).
    """
    gender = jnp.argmax(output[:, 0:2], axis=-1)
    age_bins = output[:, 2:202].reshape(-1, 100, 2)
    age = jnp.sum(jnp.argmax(age_bins, axis=-1), axis=-1)
    return gender, age
