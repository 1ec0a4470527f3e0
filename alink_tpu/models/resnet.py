"""VGGFace featurizer backbones (reference: code/siamese.py:187-216).

``VGGFaceResNet50`` re-creates the keras_vggface ``resnet50`` topology the
reference uses as its teacher-side featurizer: a standard ResNet50-v1
(bottleneck blocks, stages 3-4-6-3) whose ``avg_pool`` output is flattened
to a 2048-d feature (code/siamese.py:203-209).  ``VGGFace16`` is the VGG16
``pool5``-flatten variant (25088-d, code/siamese.py:187-193).

TPU-first notes:
- bfloat16 conv/BN compute with float32 accumulation (MXU path);
- inference-mode BN folds to scale+shift (running stats are params here —
  the framework trains only the siamese heads, matching the reference which
  uses these backbones frozen, code/siamese.py:215-216);
- NHWC layout throughout (XLA's preferred TPU conv layout).

Callers apply ``preprocess.vggface(x, version=...)`` first (v1 for VGG16,
v2 for ResNet50 — code/siamese.py:195-197, 211-213).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# Per-family BatchNorm epsilons — checkpoint parity demands the SAME eps
# the training framework baked into the released stats:
# - keras_vggface backbones (VGGFaceResNet50 / SENet50): Keras-2
#   BatchNormalization default epsilon = 1e-3 (keras_vggface models.py
#   never overrides it);
# - insightface MXNet backbones (models/arcface.py): symbol-json
#   eps = 2e-5 (see tools/convert_mxnet._BN_EPS).
KERAS_BN_EPS = 1e-3
MXNET_BN_EPS = 2e-5


class _FrozenBN(nn.Module):
    """Inference batch-norm: y = (x - mean) / sqrt(var + eps) * gamma + beta.

    Stats are parameters (no mutable state): the reference runs these
    backbones frozen in inference mode only.  ``eps`` must match the
    source framework of the stats being loaded (see KERAS_BN_EPS /
    MXNET_BN_EPS above) — a mismatched eps is a silent per-channel scale
    error of up to a few percent on low-variance channels.
    """

    eps: float = KERAS_BN_EPS
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        scale = (gamma / jnp.sqrt(var + self.eps)).astype(self.dtype)
        shift = (beta - mean * gamma / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x.astype(self.dtype) * scale + shift


class _StemConv(nn.Module):
    """keras_vggface stem conv — Conv2D(64, 7x7, s2, padding='same') —
    with an EXACT 2x2 space-to-depth reformulation on even inputs.

    TF 'SAME' at even H pads (2, 3); padding (3, 5) instead and zeroing
    an extra kernel row/col at the top-left makes the tap window
    8x8-aligned, so the strided 7x7 conv becomes a stride-1 4x4 conv on
    the 2x2-block-interleaved image (channel = (dy, dx, ch)).  Same
    arithmetic, reordered summation.  Why: XLA's conv emitter runs the
    cin=3 strided 7x7 at 32 TF/s (BENCHMARKS.md stage ablation) — the
    MXU contraction wants more input channels and no stride.  The param
    tree is unchanged (kernel stays (7, 7, cin, features) under the
    same module name), so converted keras_vggface checkpoints load
    as-is.  Odd inputs fall back to the plain conv.
    """

    features: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        if not self.s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        hp, wp = h + 8, w + 8
        xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, hp // 2, wp // 2, 4 * cin)
        k8 = jnp.pad(kernel.astype(self.dtype),
                     ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features)
        y = jax.lax.conv_general_dilated(
            xs, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, : h // 2, : w // 2]


class _Bottleneck(nn.Module):
    """ResNet-v1 bottleneck: 1x1 -> 3x3 -> 1x1 with identity/projection add."""

    filters: int  # width of the two narrow convs; output is 4x this
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.filters
        shortcut = x
        y = nn.Conv(f, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_FrozenBN(dtype=self.dtype)(y))
        y = nn.Conv(f, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(_FrozenBN(dtype=self.dtype)(y))
        y = nn.Conv(4 * f, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _FrozenBN(dtype=self.dtype)(y)
        if self.project:
            shortcut = nn.Conv(4 * f, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            shortcut = _FrozenBN(dtype=self.dtype)(shortcut)
        return nn.relu(y + shortcut)


class _ScanBottleneck(nn.Module):
    """lax.scan body over a stage's homogeneous (stride-1, identity-
    shortcut) bottlenecks — see ``VGGFaceResNet50.scan_units``."""

    filters: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, _) -> tuple[jnp.ndarray, None]:
        return _Bottleneck(self.filters, stride=1, project=False,
                           dtype=self.dtype)(x), None


class VGGFaceResNet50(nn.Module):
    """keras_vggface resnet50 to the flattened avg_pool (2048-d).

    Reference: code/siamese.py:203-216 (RESNET50.process, predict bs=128 —
    here the whole batch is one jit'd sharded forward pass).

    ``scan_units=True``: each stage's non-entry bottlenecks run as one
    ``lax.scan`` over stacked params (smaller HLO, faster compiles —
    same rationale as ``arcface.ArcFaceResNet100.scan_units``); convert
    checkpoints with ``models.stack_bottleneck_params``.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.bfloat16
    scan_units: bool = False
    s2d_stem: bool = False  # space-to-depth stem (exact; measured a wash
    # fused and slower standalone -- see BENCHMARKS.md stem A/B)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # keras_vggface stem: Conv2D(7x7, s2, padding='same') — TF 'SAME'
        # pads ASYMMETRICALLY ((2,3) at 224) — then MaxPooling2D(3x3, s2)
        # with its default VALID padding (55x55 at 224).  The torchvision
        # convention (symmetric (3,3) + padded pool -> 56x56) selects a
        # shifted pixel grid and would break parity with converted
        # keras_vggface checkpoints.
        x = _StemConv(64, dtype=self.dtype, s2d=self.s2d_stem,
                      name="Conv_0")(x)
        x = nn.relu(_FrozenBN(dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            if self.scan_units:
                x = _Bottleneck(w, stride=2 if stage > 0 else 1,
                                project=True, dtype=self.dtype)(x)
                if blocks > 1:
                    body = nn.scan(
                        _ScanBottleneck,
                        variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=blocks - 1,
                    )(w, dtype=self.dtype)
                    x, _ = body(x, None)
                continue
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = _Bottleneck(w, stride=stride, project=(b == 0),
                                dtype=self.dtype)(x)
        # Global average pool == keras avg_pool(7x7) at 224x224 input.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x  # (N, 2048)


def _fold_bn(bn: dict, eps: float = KERAS_BN_EPS):
    """_FrozenBN params -> (scale, shift) in f32."""
    s = bn["gamma"] / jnp.sqrt(bn["var"] + eps)
    return s, bn["beta"] - bn["mean"] * s


def bottleneck_weights(block_params: dict):
    """Flax ``_Bottleneck`` params -> ops.resblock.BottleneckWeights
    (1x1 kernels squeezed, BN folded to scale/shift, projection optional).
    """
    from alink_tpu.ops.resblock import BottleneckWeights

    bp = block_params
    s1, b1 = _fold_bn(bp["_FrozenBN_0"])
    s2, b2 = _fold_bn(bp["_FrozenBN_1"])
    s3, b3 = _fold_bn(bp["_FrozenBN_2"])
    proj = "Conv_3" in bp
    sp, bpp = _fold_bn(bp["_FrozenBN_3"]) if proj else (None, None)
    return BottleneckWeights(
        bp["Conv_0"]["kernel"][0, 0], s1, b1,
        bp["Conv_1"]["kernel"], s2, b2,
        bp["Conv_2"]["kernel"][0, 0], s3, b3,
        bp["Conv_3"]["kernel"][0, 0] if proj else None, sp, bpp,
    )


def vggface_resnet50_fused_apply(
    variables, x: jnp.ndarray,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    interpret: bool = False,
) -> jnp.ndarray:
    """``VGGFaceResNet50.apply`` with stride-1 bottlenecks as fused Pallas
    blocks (ops/resblock.py) — same parameters, same topology, ~bf16-level
    numerics.

    Why: XLA runs this backbone at ~44 TF/s because the bottleneck 1x1
    convs are bandwidth-bound (BENCHMARKS.md, stage ablation); the fused
    block holds y1/y2 in VMEM so each block reads x once and writes out
    once.  The stem and the three stride-2 blocks stay on XLA (a strided
    1x1 conv is a subsample + matmul; the strided 3x3 uses the native conv
    emitter).
    """
    from alink_tpu.ops.resblock import bottleneck_chain

    P = variables["params"]
    dt = jnp.bfloat16
    y = x.astype(dt)
    # Same keras_vggface stem as VGGFaceResNet50.__call__: TF-'SAME'
    # conv (asymmetric pad) + VALID pool.
    y = jax.lax.conv_general_dilated(
        y, P["Conv_0"]["kernel"].astype(dt), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s, b = _fold_bn(P["_FrozenBN_0"])
    y = jnp.maximum(y * s.astype(dt) + b.astype(dt), 0)
    y = nn.max_pool(y, (3, 3), strides=(2, 2))

    def strided_block(bp: dict, y: jnp.ndarray) -> jnp.ndarray:
        """Stride-2 bottleneck on XLA (3 of 16 blocks)."""
        s1, b1 = _fold_bn(bp["_FrozenBN_0"])
        z = y[:, ::2, ::2] @ bp["Conv_0"]["kernel"][0, 0].astype(dt)
        z = jnp.maximum(z * s1.astype(dt) + b1.astype(dt), 0)
        s2, b2 = _fold_bn(bp["_FrozenBN_1"])
        z = jax.lax.conv_general_dilated(
            z, bp["Conv_1"]["kernel"].astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = jnp.maximum(z * s2.astype(dt) + b2.astype(dt), 0)
        s3, b3 = _fold_bn(bp["_FrozenBN_2"])
        z = z @ bp["Conv_2"]["kernel"][0, 0].astype(dt)
        z = z * s3.astype(dt) + b3.astype(dt)
        sp, bpp = _fold_bn(bp["_FrozenBN_3"])
        sc = y[:, ::2, ::2] @ bp["Conv_3"]["kernel"][0, 0].astype(dt)
        sc = sc * sp.astype(dt) + bpp.astype(dt)
        return jnp.maximum(z + sc, 0)

    idx = 0
    for stage, blocks in enumerate(stage_sizes):
        chain = []
        for bi in range(blocks):
            bp = P[f"_Bottleneck_{idx}"]
            idx += 1
            if bi == 0 and stage > 0:
                y = strided_block(bp, y)
            else:
                chain.append(bottleneck_weights(bp))
        if chain:
            y = bottleneck_chain(y, tuple(chain), interpret=interpret)
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))


class _SEBottleneck(nn.Module):
    """Squeeze-and-excitation bottleneck (keras_vggface senet50 topology:
    ResNet-v1 bottleneck + SE gate with reduction 16)."""

    filters: int
    stride: int = 1
    project: bool = False
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.filters
        shortcut = x
        y = nn.Conv(f, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(_FrozenBN(dtype=self.dtype)(y))
        y = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.relu(_FrozenBN(dtype=self.dtype)(y))
        y = nn.Conv(4 * f, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _FrozenBN(dtype=self.dtype)(y)
        # SE gate: global pool -> bottleneck MLP -> sigmoid channel scale.
        se = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        se = nn.relu(nn.Dense(4 * f // self.reduction,
                              dtype=jnp.float32)(se))
        se = nn.sigmoid(nn.Dense(4 * f, dtype=jnp.float32)(se))
        y = y * se[:, None, None, :].astype(self.dtype)
        if self.project:
            shortcut = nn.Conv(4 * f, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            shortcut = _FrozenBN(dtype=self.dtype)(shortcut)
        return nn.relu(y + shortcut)


class SENet50(nn.Module):
    """keras_vggface senet50 to the flattened avg_pool (2048-d).

    Reference: code/model.py:126-141 (SENET50 classifier backbone).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.bfloat16
    s2d_stem: bool = False  # space-to-depth stem (exact; measured a wash
    # fused and slower standalone -- see BENCHMARKS.md stem A/B)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # keras_vggface stem: Conv2D(7x7, s2, padding='same') — TF 'SAME'
        # pads ASYMMETRICALLY ((2,3) at 224) — then MaxPooling2D(3x3, s2)
        # with its default VALID padding (55x55 at 224).  The torchvision
        # convention (symmetric (3,3) + padded pool -> 56x56) selects a
        # shifted pixel grid and would break parity with converted
        # keras_vggface checkpoints.
        x = _StemConv(64, dtype=self.dtype, s2d=self.s2d_stem,
                      name="Conv_0")(x)
        x = nn.relu(_FrozenBN(dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = _SEBottleneck(w, stride=stride, project=(b == 0),
                                  dtype=self.dtype)(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, 2048)


class VGGFace16(nn.Module):
    """keras_vggface vgg16 to the flattened pool5 (25088-d at 224x224).

    Reference: code/siamese.py:187-200.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for widths in ((64, 64), (128, 128), (256, 256, 256),
                       (512, 512, 512), (512, 512, 512)):
            for w in widths:
                x = nn.relu(nn.Conv(w, (3, 3), padding="SAME", dtype=self.dtype)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape((x.shape[0], -1)).astype(jnp.float32)


def stack_bottleneck_params(params: dict, stage_sizes=(3, 4, 6, 3)) -> dict:
    """VGGFaceResNet50 unrolled param tree -> ``scan_units`` layout."""
    from alink_tpu.models.scan_params import stack_unit_params

    return stack_unit_params(params, stage_sizes, "_Bottleneck_",
                             "Scan_ScanBottleneck_")


def unstack_bottleneck_params(params: dict, stage_sizes=(3, 4, 6, 3)) -> dict:
    """Inverse of ``stack_bottleneck_params``."""
    from alink_tpu.models.scan_params import unstack_unit_params

    return unstack_unit_params(params, stage_sizes, "_Bottleneck_",
                               "Scan_ScanBottleneck_")
