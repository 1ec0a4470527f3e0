"""Tensor-parallel ArcFace embedding (Megatron-style conv sharding).

Greenfield scale-out (SURVEY.md section 2.4: the reference is strictly
single-GPU).  Data parallelism covers every A-LINK workload on its own —
this module exists for the deployment regime DP cannot reach: serving a
single small batch at minimum latency, where the ``model`` mesh axis
must shrink per-example time rather than grow throughput.

The LResNetE improved-residual unit maps onto the classic Megatron
column/row split with exactly ONE collective per unit:

- ``Conv_0`` (3x3, stride 1): **column-parallel** — the kernel is
  sharded on its *output*-channel dim, each device computes its channel
  slice of the activation;
- ``_FrozenBN_1`` and ``_PReLU_0`` act per-channel, so their parameters
  shard the same way and apply locally with no communication;
- ``Conv_1`` (3x3, stride s): **row-parallel** — the kernel is sharded
  on its *input*-channel dim, each device contracts its channel slice,
  and one ``psum`` over ``model`` restores the full activation;
- ``_FrozenBN_0``/``_FrozenBN_2`` and the 1x1 projection shortcut see
  full-channel activations and run replicated (the 1x1 is ~2% of the
  unit's FLOPs — not worth a second collective).

The stem, output BN, fc1 Dense and L2 normalisation are replicated.
Numerics: identical op graph per channel slice; the only difference vs
the single-device forward is the psum's summation order across channel
blocks (validated to tolerance in ``tests/test_parallel.py``).

Use ``arcface_tp_apply(mesh, params, images)`` with any params produced
by ``ArcFaceResNet100.init`` or ``tools/convert_mxnet.convert_arcface``
— the param tree is sharded in place by ``tp_param_specs``'s
PartitionSpecs, no repacking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_BN_EPS = 2e-5  # insightface MXNet eps — must match models/arcface.py


def _conv(x, kernel, stride=1, padding=((1, 1), (1, 1)), dtype=None):
    if dtype is not None:
        x, kernel = x.astype(dtype), kernel.astype(dtype)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, dtype):
    scale = (p["gamma"] / jnp.sqrt(p["var"] + _BN_EPS)).astype(dtype)
    shift = (p["beta"] - p["mean"] * p["gamma"]
             / jnp.sqrt(p["var"] + _BN_EPS)).astype(dtype)
    return x.astype(dtype) * scale + shift


def _prelu(x, alpha, dtype):
    a = alpha.astype(dtype)
    x = x.astype(dtype)
    return jnp.where(x >= 0, x, a * x)


def _stem(p, x, dtype):
    """Stem conv/BN/PReLU — ONE copy of the LResNet topology shared with
    the pipeline-parallel schedule (parallel/pp.py)."""
    x = _conv(x.astype(dtype), p["Conv_0"]["kernel"], dtype=dtype)
    x = _bn(x, p["_FrozenBN_0"], dtype)
    return _prelu(x, p["_PReLU_0"]["alpha"], dtype)


def _head(p, x, dtype):
    """Tail BN / fc1 / folded output BN / L2 norm (shared with pp.py)."""
    x = _bn(x, p["_FrozenBN_1"], dtype)
    x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
    x = x @ p["Dense_0"]["kernel"].astype(jnp.float32) \
        + p["Dense_0"]["bias"].astype(jnp.float32)
    x = x * p["fc1_gamma"] + p["fc1_beta"]
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, 1e-12)


def _ir_unit(x, up, stride, dtype, reduce=None):
    """One IR unit.  ``reduce`` is applied after the second conv: the
    tensor-parallel path passes a model-axis psum (row-parallel output
    reassembly); the pipeline schedule runs units whole (reduce=None).
    One copy of the unit topology for both parallel schemes."""
    y = _bn(x, up["_FrozenBN_0"], dtype)
    # Column-parallel under TP: kernel (3, 3, cin, f/k) channel slice.
    y = _conv(y, up["Conv_0"]["kernel"], dtype=dtype)
    y = _bn(y, up["_FrozenBN_1"], dtype)          # per-channel: local
    y = _prelu(y, up["_PReLU_0"]["alpha"], dtype)
    # Row-parallel under TP: contract the local slice, then reduce.
    y = _conv(y, up["Conv_1"]["kernel"], stride=stride, dtype=dtype)
    if reduce is not None:
        y = reduce(y)
    y = _bn(y, up["_FrozenBN_2"], dtype)
    if "Conv_2" in up:
        sc = _conv(x, up["Conv_2"]["kernel"], stride=stride,
                   padding=((0, 0), (0, 0)), dtype=dtype)
        sc = _bn(sc, up["_FrozenBN_3"], dtype)
    else:
        sc = x
    return y + sc


def _forward(params, images, *, unit_strides, dtype):
    p = params["params"] if "params" in params else params
    x = _stem(p, images, dtype)
    psum = lambda v: lax.psum(v, MODEL_AXIS)  # noqa: E731
    for i, stride in enumerate(unit_strides):
        x = _ir_unit(x, p[f"_IRUnit_{i}"], stride, dtype, reduce=psum)
    return _head(p, x, dtype)


def _unit_strides(stage_sizes) -> tuple[int, ...]:
    return tuple(2 if b == 0 else 1
                 for blocks in stage_sizes for b in range(blocks))


def tp_param_specs(params) -> object:
    """PartitionSpec tree for Megatron sharding of ArcFace params.

    Per IR unit: ``Conv_0.kernel`` on its output-channel dim,
    ``Conv_1.kernel`` on its input-channel dim, the middle BN/PReLU
    per-channel; everything else replicated.
    """

    def spec(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        in_unit = any(str(n).startswith("_IRUnit_") for n in names)
        if not in_unit:
            return P()
        if "Conv_0" in names:
            return P(None, None, None, MODEL_AXIS)
        if "Conv_1" in names:
            return P(None, None, MODEL_AXIS, None)
        if "_FrozenBN_1" in names or "_PReLU_0" in names:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _pad_unit_params(params, n_ranks: int):
    """Zero-pad the model-sharded unit dims up to multiples of ``n_ranks``.

    Only the four leaves the TP split shards are touched: ``Conv_0``'s
    output channels (pad kernel with zeros -> padded activations are 0),
    the middle ``_FrozenBN_1`` (pad mean/beta/gamma 0, var 1 -> 0 maps to
    0) and ``_PReLU_0`` alpha (pad 1 -> 0 stays 0), and ``Conv_1``'s
    input channels (pad zeros -> the dead channels contribute nothing to
    the row-parallel contraction).  Exact: every padded lane carries 0
    through the whole unit.  Identity when all widths already divide.
    """
    def up(n):
        return -(-n // n_ranks) * n_ranks

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if not k.startswith("_IRUnit_"):
                out[k] = v
                continue
            u = dict(v)
            f = u["Conv_0"]["kernel"].shape[3]
            fp = up(f)
            if fp != f:
                pad = fp - f
                u["Conv_0"] = {"kernel": jnp.pad(
                    u["Conv_0"]["kernel"], ((0, 0),) * 3 + ((0, pad),))}
                bn = dict(u["_FrozenBN_1"])
                for name, fill in (("gamma", 0.0), ("beta", 0.0),
                                   ("mean", 0.0), ("var", 1.0)):
                    bn[name] = jnp.pad(bn[name], (0, pad),
                                       constant_values=fill)
                u["_FrozenBN_1"] = bn
                u["_PReLU_0"] = {"alpha": jnp.pad(
                    u["_PReLU_0"]["alpha"], (0, pad), constant_values=1.0)}
                u["Conv_1"] = {"kernel": jnp.pad(
                    u["Conv_1"]["kernel"],
                    ((0, 0), (0, 0), (0, pad), (0, 0)))}
            out[k] = u
        return out

    if "params" in params:
        return {**params, "params": walk(params["params"])}
    return walk(params)


def arcface_tp_apply(
    mesh: Mesh,
    params,
    images: jnp.ndarray,
    *,
    stage_sizes=(3, 13, 30, 3),
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Tensor+data-parallel ArcFace forward over a (data, model) mesh.

    ``images``: (N, H, W, 3) raw RGB, N divisible by the ``data`` axis.
    Stage widths need NOT divide the ``model`` axis: non-divisible unit
    widths are zero-padded up to the next multiple (``_pad_unit_params``
    — exact, the pad lanes carry zeros end to end).  Equals
    ``ArcFaceResNet100(...).apply(params, images)`` up to the psum's
    cross-block summation order.
    """
    params = _pad_unit_params(params, mesh.shape[MODEL_AXIS])
    specs = tp_param_specs(params)
    params = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs))
    images = jax.device_put(
        images, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))

    fwd = shard_map(
        partial(_forward, unit_strides=_unit_strides(stage_sizes),
                dtype=dtype),
        mesh=mesh,
        in_specs=(specs, P(DATA_AXIS, None, None, None)),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )
    return fwd(params, images)
