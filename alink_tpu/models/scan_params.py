"""Param-layout converters between unrolled and lax.scan'd stage units.

Both frozen backbones (`arcface.ArcFaceResNet100`, `resnet.
VGGFaceResNet50`) share the same stage shape: one distinct entry unit
(stride-2 and/or projection) followed by ``blocks - 1`` homogeneous
units.  With ``scan_units=True`` the homogeneous tail runs as one
``nn.scan`` body over params stacked on a leading axis; these helpers
convert checkpoints (which use the unrolled layout — it is what the
MXNet/h5 converters and orbax files produce) to the scanned layout and
back, exactly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def stack_unit_params(
    params: dict,
    stage_sizes: Sequence[int],
    unit_prefix: str,
    scan_prefix: str,
) -> dict:
    """Unrolled ``{unit_prefix}{k}`` entries -> per-stage entry unit +
    ``{scan_prefix}{i}`` stacked tails (flax names the scanned submodule
    ``{unit_prefix}0`` inside)."""
    p = dict(params["params"]) if "params" in params else dict(params)
    out = {k: v for k, v in p.items() if not k.startswith(unit_prefix)}
    k = 0
    scan_idx = 0
    for s, blocks in enumerate(stage_sizes):
        out[f"{unit_prefix}{s}"] = p[f"{unit_prefix}{k}"]
        if blocks > 1:
            rest = [p[f"{unit_prefix}{k + 1 + b}"] for b in range(blocks - 1)]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *rest)
            out[f"{scan_prefix}{scan_idx}"] = {f"{unit_prefix}0": stacked}
            scan_idx += 1
        k += blocks
    return {"params": out} if "params" in params else out


def unstack_unit_params(
    params: dict,
    stage_sizes: Sequence[int],
    unit_prefix: str,
    scan_prefix: str,
) -> dict:
    """Inverse of ``stack_unit_params`` (scanned -> unrolled)."""
    p = dict(params["params"]) if "params" in params else dict(params)
    out = {k: v for k, v in p.items()
           if not (k.startswith(unit_prefix) or k.startswith(scan_prefix))}
    k = 0
    scan_idx = 0
    for s, blocks in enumerate(stage_sizes):
        out[f"{unit_prefix}{k}"] = p[f"{unit_prefix}{s}"]
        if blocks > 1:
            stacked = p[f"{scan_prefix}{scan_idx}"][f"{unit_prefix}0"]
            for b in range(blocks - 1):
                out[f"{unit_prefix}{k + 1 + b}"] = jax.tree.map(
                    lambda x, b=b: x[b], stacked)
            scan_idx += 1
        k += blocks
    return {"params": out} if "params" in params else out
