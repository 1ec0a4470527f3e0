"""ArcFace LResNet100E-II embedder (reference: code/face_model.py).

The reference wraps an MXNet checkpoint of InsightFace's LResNet100E-II,
truncated at ``fc1_output`` (code/face_model.py:28-41), runs it at batch=1
(:39) and L2-normalises the 512-d embedding (:92).  This module rebuilds the
topology TPU-first:

- "improved residual" (IR) units:  BN - Conv3x3 - BN - PReLU - Conv3x3(s) -
  BN, with a Conv1x1(s)+BN shortcut on dimension change;
- stem:  Conv3x3/1 (64) - BN - PReLU  on 112x112 input;
- stages of (3, 13, 30, 3) units at widths (64, 128, 256, 512), stride 2 at
  each stage entry -> 7x7x512;
- output head "E":  BN - Flatten - Dense(512) - BN  (the fc1 layer);
- embeddings are L2-normalised (face_model.py:92).

Batched, bfloat16, jit'd — the batch=1 limitation of the reference
(BASELINE.md "Efficiency baseline") is gone by construction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from alink_tpu.models.resnet import MXNET_BN_EPS, _FrozenBN


class _PReLU(nn.Module):
    """Channel-wise PReLU (MXNet default for LResNet)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class _IRUnit(nn.Module):
    """Improved-residual unit of LResNetE (BN-first variant)."""

    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.filters
        project = self.stride != 1 or x.shape[-1] != f
        y = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(x)
        y = nn.Conv(f, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(y)
        y = _PReLU(dtype=self.dtype)(y)
        # Explicit symmetric (1, 1) padding: MXNet/Caffe convention.  XLA's
        # "SAME" pads (0, 1) for stride-2 3x3 on even inputs, which selects
        # a pixel grid shifted by one vs the reference checkpoint.
        y = nn.Conv(f, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(y)
        if project:
            shortcut = nn.Conv(f, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            shortcut = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(shortcut)
        else:
            shortcut = x
        return y + shortcut


class _ScanIR(nn.Module):
    """lax.scan body over a stage's homogeneous (stride-1) IR units."""

    filters: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, _) -> tuple[jnp.ndarray, None]:
        return _IRUnit(self.filters, stride=1, dtype=self.dtype)(x), None


class ArcFaceResNet100(nn.Module):
    """LResNet100E-II to the L2-normalised 512-d fc1 embedding.

    Reference behaviour being matched: code/face_model.py:86-93 (forward to
    fc1_output, then sklearn L2 normalize).  Input is raw RGB in [0, 255] at
    112x112 (the reference feeds raw transposed pixels, face_model.py:70-84);
    the stem BN handles scaling.

    ``scan_units=True`` runs each stage's stride-1 units as one
    ``lax.scan`` over stacked params instead of unrolling them into the
    program — identical numerics (same op sequence), much smaller HLO
    (r100's 30-unit stage 3 traces once), so compile/cold-start time
    drops sharply.  Param trees differ: ``stack_ir_params`` /
    ``unstack_ir_params`` convert between the two layouts.
    """

    stage_sizes: Sequence[int] = (3, 13, 30, 3)
    stage_widths: Sequence[int] = (64, 128, 256, 512)
    embedding_dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16
    scan_units: bool = False
    # L2-normalise the fc1 output (face_model.py:92).  The genderage
    # checkpoint runs the SAME trunk but its 202-d fc1 output is decoded
    # raw (face_model.py:95-107) — set False there.
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(x)
        x = _PReLU(dtype=self.dtype)(x)
        for blocks, width in zip(self.stage_sizes, self.stage_widths):
            if self.scan_units:
                x = _IRUnit(width, stride=2, dtype=self.dtype)(x)
                if blocks > 1:
                    body = nn.scan(
                        _ScanIR,
                        variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=blocks - 1,
                    )(width, dtype=self.dtype)
                    x, _ = body(x, None)
                continue
            for b in range(blocks):
                x = _IRUnit(width, stride=2 if b == 0 else 1, dtype=self.dtype)(x)
        x = _FrozenBN(eps=MXNET_BN_EPS, dtype=self.dtype)(x)
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.Dense(self.embedding_dim, dtype=jnp.float32)(x)
        # fc1 output BN (1-D), then L2 normalisation (face_model.py:92).
        gamma = self.param("fc1_gamma", nn.initializers.ones,
                           (self.embedding_dim,), jnp.float32)
        beta = self.param("fc1_beta", nn.initializers.zeros,
                          (self.embedding_dim,), jnp.float32)
        x = x * gamma + beta
        if not self.normalize:
            return x
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)


def stack_ir_params(params: dict, stage_sizes: Sequence[int]) -> dict:
    """Convert an unrolled ArcFace param tree to the ``scan_units`` layout.

    Unrolled: flat ``_IRUnit_{k}`` entries, k counting across stages.
    Scanned: per stage s, the stride-2 entry unit as ``_IRUnit_{s}`` plus
    one ``Scan_ScanIR_{i}`` whose ``_IRUnit_0`` leaves carry a leading
    (blocks-1) axis.  Checkpoints (and the MXNet converter) produce the
    unrolled layout; apply this before ``ArcFaceResNet100(scan_units=
    True).apply``.
    """
    from alink_tpu.models.scan_params import stack_unit_params

    return stack_unit_params(params, stage_sizes, "_IRUnit_", "Scan_ScanIR_")


def unstack_ir_params(params: dict, stage_sizes: Sequence[int]) -> dict:
    """Inverse of ``stack_ir_params`` (scanned layout -> unrolled)."""
    from alink_tpu.models.scan_params import unstack_unit_params

    return unstack_unit_params(params, stage_sizes, "_IRUnit_",
                               "Scan_ScanIR_")


def ArcFaceResNet50(**kwargs) -> ArcFaceResNet100:
    """LResNet50E-IR: the insightface zoo's 50-layer sibling of r100.

    Unit counts (3, 4, 14, 3) per insightface's fresnet depth table; same
    IR unit, widths, and E-head as r100, so the reference's loader
    (face_model.py:28-41, which accepts any LResNet checkpoint path)
    covers it too.  ~12.6 GFLOP/face vs r100's ~24 — its bf16 embed
    roofline on this chip is ~15.6k faces/s, clearing the 10k north star
    for deployments that accept the smaller backbone (see BENCHMARKS.md).
    """
    return ArcFaceResNet100(stage_sizes=(3, 4, 14, 3), **kwargs)


def ArcFaceResNet34(**kwargs) -> ArcFaceResNet100:
    """LResNet34E-IR: unit counts (3, 4, 6, 3) from the same depth table."""
    return ArcFaceResNet100(stage_sizes=(3, 4, 6, 3), **kwargs)
