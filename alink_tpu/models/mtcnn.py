"""MTCNN cascade networks (reference: code/mtcnn_detector.py:52-65).

The reference loads four MXNet checkpoints (det1..det4).  These flax modules
re-create the canonical MTCNN topologies:

- ``PNet`` — fully-convolutional proposal net.  Input: any HxW (scaled
  pyramid level), output: per-cell face probability (stride 2, cell 12 —
  code/helper.py:109-110) and 4-d box regression.
- ``RNet`` — 24x24 refine net: prob + 4-d regression
  (code/mtcnn_detector.py:405-428).
- ``ONet`` — 48x48 output net: prob + 4-d regression + 10-d landmarks
  (code/mtcnn_detector.py:439-464).
- ``LNet`` — landmark refinement over five 24x24 patches stacked on the
  channel axis (15 input channels), emitting 5 x 2 offsets
  (code/mtcnn_detector.py:485-508).

Inputs are NHWC, preprocessed by ``preprocess.mtcnn`` ((x-127.5)*0.0078125,
code/helper.py:89).  Max-pooling uses ceil-mode padding to match the Caffe/
MXNet originals' output grids.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from alink_tpu.models.arcface import _PReLU


def _ceil_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Max pool with ceil-mode output size (Caffe convention in MTCNN)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = max(0, (-(h - window) % stride) if h > window else window - h)
    pad_w = max(0, (-(w - window) % stride) if w > window else window - w)
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((0, pad_h), (0, pad_w)),
    )


class PNet(nn.Module):
    """Proposal network: conv10-pool-conv16-conv32 -> (prob, reg)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.dtype)
        x = _PReLU(dtype=self.dtype)(nn.Conv(10, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 2, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(16, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _PReLU(dtype=self.dtype)(nn.Conv(32, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        logits = nn.Conv(2, (1, 1), dtype=jnp.float32)(x.astype(jnp.float32))
        prob = nn.softmax(logits, axis=-1)
        reg = nn.Conv(4, (1, 1), dtype=jnp.float32)(x.astype(jnp.float32))
        return prob, reg  # (N, h', w', 2), (N, h', w', 4)


class RNet(nn.Module):
    """Refine network on 24x24 crops -> (prob, reg)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.dtype)
        x = _PReLU(dtype=self.dtype)(nn.Conv(28, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(48, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(64, (2, 2), padding="VALID",
                                             dtype=self.dtype)(x))
        x = x.reshape((x.shape[0], -1))
        x = _PReLU(dtype=self.dtype)(nn.Dense(128, dtype=self.dtype)(x))
        x32 = x.astype(jnp.float32)
        prob = nn.softmax(nn.Dense(2, dtype=jnp.float32)(x32), axis=-1)
        reg = nn.Dense(4, dtype=jnp.float32)(x32)
        return prob, reg


class ONet(nn.Module):
    """Output network on 48x48 crops -> (prob, reg, landmarks)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.dtype)
        x = _PReLU(dtype=self.dtype)(nn.Conv(32, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(64, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(64, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 2, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(128, (2, 2), padding="VALID",
                                             dtype=self.dtype)(x))
        x = x.reshape((x.shape[0], -1))
        x = _PReLU(dtype=self.dtype)(nn.Dense(256, dtype=self.dtype)(x))
        x32 = x.astype(jnp.float32)
        prob = nn.softmax(nn.Dense(2, dtype=jnp.float32)(x32), axis=-1)
        reg = nn.Dense(4, dtype=jnp.float32)(x32)
        landmarks = nn.Dense(10, dtype=jnp.float32)(x32)  # x1..x5, y1..y5
        return prob, reg, landmarks


class LNet(nn.Module):
    """Landmark refinement over 5 stacked 24x24 patches (15 channels).

    Emits per-landmark (dx, dy) offsets in [0, 1] patch coordinates
    (code/mtcnn_detector.py:497-508 consumes 5 heads of 2).
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.dtype)
        x = _PReLU(dtype=self.dtype)(nn.Conv(28, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(48, (3, 3), padding="VALID",
                                             dtype=self.dtype)(x))
        x = _ceil_pool(x, 3, 2)
        x = _PReLU(dtype=self.dtype)(nn.Conv(64, (2, 2), padding="VALID",
                                             dtype=self.dtype)(x))
        x = x.reshape((x.shape[0], -1))
        x = _PReLU(dtype=self.dtype)(nn.Dense(256, dtype=self.dtype)(x))
        x32 = x.astype(jnp.float32)
        # Five heads of (dx, dy), sigmoid-bounded to [0, 1] like the MXNet net.
        offsets = [nn.sigmoid(nn.Dense(2, dtype=jnp.float32)(x32)) for _ in range(5)]
        return jnp.stack(offsets, axis=1)  # (N, 5, 2)
