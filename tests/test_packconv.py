"""packed_conv must equal lax.conv (VALID, stride 1) exactly in f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from alink_tpu.ops.packconv import conv_flops, packed_conv


def _ref_conv(x, kernel, bias=None):
    out = lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out if bias is None else out + bias


@pytest.mark.parametrize("shape,k,cout,p", [
    ((2, 12, 12, 3), 3, 10, 4),    # P-Net conv1
    ((2, 11, 11, 10), 3, 16, 4),   # P-Net conv2 (odd size -> pad blocks)
    ((2, 9, 9, 16), 3, 32, 4),     # P-Net conv3
    ((3, 24, 24, 3), 3, 28, 4),    # R-Net conv1
    ((3, 11, 11, 28), 3, 48, 4),   # R-Net conv2
    ((3, 4, 4, 48), 2, 64, 4),     # R-Net conv3 (2x2 kernel, p clamps)
    ((2, 46, 46, 32), 3, 64, 4),   # O-Net conv2 input scale
    ((2, 8, 8, 64), 2, 128, 3),    # O-Net conv4
    ((1, 5, 7, 4), 3, 6, 4),       # non-square, p > blocks
    ((1, 3, 3, 2), 3, 5, 4),       # single output pixel
])
def test_matches_lax_conv(shape, k, cout, p):
    kx, kk = jax.random.split(jax.random.PRNGKey(hash((shape, k, cout)) % 997))
    x = jax.random.normal(kx, shape, jnp.float32)
    kernel = jax.random.normal(kk, (k, k, shape[-1], cout), jnp.float32) * 0.3
    bias = jnp.linspace(-1.0, 1.0, cout)
    want = _ref_conv(x, kernel, bias)
    got = packed_conv(x, kernel, bias, p=p)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bf16_class_numerics():
    """bf16 operands with f32 accumulation stay within the usual budget."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 24, 3)) * 100
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 28)) * 0.1
    want = _ref_conv(x, kernel)
    got = packed_conv(x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                      p=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2.0, rtol=5e-2)


def test_flops_accounting():
    assert conv_flops((1, 12, 12, 3), (3, 3, 3, 10)) == \
        2 * 10 * 10 * 9 * 3 * 10
