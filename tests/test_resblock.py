"""Fused bf16 bottleneck blocks (ops/resblock.py) vs the flax reference.

The fused path must reproduce VGGFaceResNet50's frozen-BN bottleneck
semantics (models/resnet.py) within the bf16 compute budget; kernels run
in interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.models.resnet import (VGGFaceResNet50, _Bottleneck,
                                     bottleneck_weights,
                                     vggface_resnet50_fused_apply)
from alink_tpu.ops.resblock import bottleneck_chain

RNG = np.random.RandomState(7)


def _rand_bn(P):
    out = {}
    for k, v in P.items():
        if isinstance(v, dict) and "gamma" in v:
            c = v["gamma"].shape[0]
            out[k] = {
                "gamma": jnp.asarray(
                    RNG.uniform(0.5, 1.5, c).astype(np.float32)),
                "beta": jnp.asarray(
                    RNG.uniform(-0.3, 0.3, c).astype(np.float32)),
                "mean": jnp.asarray(
                    RNG.uniform(-0.3, 0.3, c).astype(np.float32)),
                "var": jnp.asarray(
                    RNG.uniform(0.5, 1.5, c).astype(np.float32)),
            }
        elif isinstance(v, dict):
            out[k] = _rand_bn(v)
        else:
            out[k] = v
    return out


@pytest.mark.parametrize("project,cin,f", [(True, 16, 8), (False, 32, 8)])
def test_single_block_matches_flax(project, cin, f):
    blk = _Bottleneck(f, stride=1, project=project, dtype=jnp.float32)
    x = jnp.asarray(RNG.randn(2, 9, 7, cin).astype(np.float32))
    p = blk.init(jax.random.PRNGKey(0), x)
    p = {"params": _rand_bn(dict(p["params"]))}
    want = np.asarray(blk.apply(p, x))
    got = np.asarray(bottleneck_chain(x, (bottleneck_weights(p["params"]),),
                                      interpret=True))
    # bf16 compute in the kernel vs f32 flax reference.
    assert np.max(np.abs(want - got)) / (np.max(np.abs(want)) + 1e-9) < 0.02


def test_chained_blocks_match_flax_sequence():
    """Two chained blocks (projection then identity) stay in flat layout
    between blocks and must match running the flax blocks back-to-back."""
    b0 = _Bottleneck(8, stride=1, project=True, dtype=jnp.float32)
    b1 = _Bottleneck(8, stride=1, project=False, dtype=jnp.float32)
    x = jnp.asarray(RNG.randn(2, 8, 11, 16).astype(np.float32))
    p0 = {"params": _rand_bn(dict(
        b0.init(jax.random.PRNGKey(1), x)["params"]))}
    y = b0.apply(p0, x)
    p1 = {"params": _rand_bn(dict(
        b1.init(jax.random.PRNGKey(2), y)["params"]))}
    want = np.asarray(b1.apply(p1, y))
    got = np.asarray(bottleneck_chain(
        x, (bottleneck_weights(p0["params"]),
            bottleneck_weights(p1["params"])), interpret=True))
    assert np.max(np.abs(want - got)) / (np.max(np.abs(want)) + 1e-9) < 0.03


@pytest.mark.slow
def test_fused_resnet50_forward_matches_flax():
    """The full fused forward (stem + strided XLA blocks + fused chains)
    reproduces VGGFaceResNet50.apply on a small config."""
    sizes = (2, 2, 2, 2)
    model = VGGFaceResNet50(stage_sizes=sizes, dtype=jnp.float32)
    x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x)
    p = {"params": _rand_bn(dict(p["params"]))}
    want = np.asarray(model.apply(p, x))
    got = np.asarray(vggface_resnet50_fused_apply(
        p, x, stage_sizes=sizes, interpret=True))
    assert want.shape == got.shape == (2, 2048)
    assert np.max(np.abs(want - got)) / np.max(np.abs(want)) < 0.02
