"""Input preprocessing, numerically matched to the reference stacks.

Numerical parity matters (SURVEY.md section 7, hard part (c)) because the
downstream embeddings feed the siamese heads and the selection loop.

- ``vggface(x, version)``  — keras_vggface ``utils.preprocess_input``:
  RGB->BGR channel flip + per-channel mean subtraction
  (reference: code/siamese.py:195-197 v1, :211-213 v2).
- ``mtcnn(x)``             — ``(x - 127.5) * 0.0078125`` (code/helper.py:89).
- ``arcface`` uses the raw RGB image in [0, 255]; normalisation happens via
  the first BN layer of LResNet100E-II (code/face_model.py:70-93 feeds raw
  transposed pixels).
- ``smallres(x)``          — ``(x - 128) / 128`` (code/siamese.py:179-181).

All functions are pure, batched, and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# keras_vggface per-channel BGR means.
_VGGFACE_V1_MEAN_BGR = (93.5940, 104.7624, 129.1863)
_VGGFACE_V2_MEAN_BGR = (91.4953, 103.8827, 131.0912)


def vggface(x: jnp.ndarray, version: int = 2) -> jnp.ndarray:
    """keras_vggface preprocess_input on NHWC RGB input (any dtype).

    Integer inputs promote to f32 first — casting the fractional means
    to an integer dtype would truncate them, and uint8 subtraction wraps
    (50 - 91 -> 215), silently corrupting every downstream feature.  The
    float-dtype path (f32/bf16) stays in the input dtype.
    """
    mean = _VGGFACE_V1_MEAN_BGR if version == 1 else _VGGFACE_V2_MEAN_BGR
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(mean, dtype=x.dtype)


def mtcnn(x: jnp.ndarray) -> jnp.ndarray:
    """MTCNN input scaling (code/helper.py:89). NHWC, any float dtype."""
    return (x - 127.5) * 0.0078125


def smallres(x: jnp.ndarray) -> jnp.ndarray:
    """SmallRes input scaling (code/siamese.py:179-181)."""
    return (x - 128.0) / 128.0


def identity(x: jnp.ndarray) -> jnp.ndarray:
    """Raw passthrough (SiameseNetwork.preprocess, code/siamese.py:127-128)."""
    return x
