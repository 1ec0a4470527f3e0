"""Int8 Pallas conv kernel: parity with the XLA int32 conv reference.

Runs the kernel in interpreter mode on the CPU backend (the suite's fake
TPU); the same code compiles via Mosaic on the real chip (see
BENCHMARKS.md for measured rates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alink_tpu.ops import qconv


@pytest.mark.parametrize("shape", [(5, 5, 8, 16), (9, 11, 4, 4)])
def test_conv3x3_int8_matches_reference(shape):
    h, w, cin, cout = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.randint(k1, (2, h, w, cin), -127, 128, jnp.int8)
    wts = jax.random.randint(k2, (3, 3, cin, cout), -20, 21, jnp.int8)
    scale = jax.random.uniform(k1, (cout,), jnp.float32, 0.001, 0.01)
    bias = jax.random.normal(k2, (cout,), jnp.float32)
    want = np.asarray(qconv.conv3x3_s1_int8_reference(
        x, wts, scale, bias, out_dtype=jnp.float32))
    got = np.asarray(qconv.conv3x3_s1_int8(
        x, wts, scale, bias, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flat_layout_round_trip():
    lo = qconv.flat_layout(3, 6, 7)
    x = jax.random.randint(jax.random.PRNGKey(1), (3, 6, 7, 4),
                           -127, 128, jnp.int8)
    f = qconv.nhwc_to_flat(x, lo)
    assert f.shape[0] == lo.rows
    # Non-pixel rows are zero (the conv taps rely on this).
    total = int(jnp.abs(f.astype(jnp.int32)).sum())
    assert total == int(jnp.abs(x.astype(jnp.int32)).sum())
    back = qconv.flat_to_nhwc(f[lo.lead:], lo)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.slow
def test_chained_convs_with_prelu_quant_epilogue():
    """conv -> PReLU+requant -> conv inside the flat layout matches the
    same computation done step-by-step in XLA NHWC."""
    n, h, w, c = 2, 6, 6, 8
    k = jax.random.PRNGKey(2)
    x = jax.random.randint(k, (n, h, w, c), -50, 51, jnp.int8)
    w1 = jax.random.randint(jax.random.fold_in(k, 1), (3, 3, c, c),
                            -10, 11, jnp.int8)
    w2 = jax.random.randint(jax.random.fold_in(k, 2), (3, 3, c, c),
                            -10, 11, jnp.int8)
    scale = jnp.full((c,), 0.01, jnp.float32)
    bias = jnp.linspace(-0.5, 0.5, c)
    alpha = jnp.full((c,), 0.25, jnp.float32)
    qs = jnp.full((c,), 11.0, jnp.float32)

    lo = qconv.flat_layout(n, h, w)
    q2 = qconv.conv3x3_s1_int8_flat(
        qconv.nhwc_to_flat(x, lo), w1, scale, bias, lo, alpha=alpha,
        quant_scale=qs, epilogue="prelu_quant", interpret=True)
    out = qconv.conv3x3_s1_int8_flat(
        qconv.add_lead(q2, lo), w2, scale, bias, lo,
        epilogue="affine", out_dtype=jnp.float32, interpret=True)
    got = np.asarray(qconv.flat_to_nhwc(out, lo))[..., :c]

    z = qconv.conv3x3_s1_int8_reference(x, w1, scale, bias,
                                        out_dtype=jnp.float32)
    d = jnp.where(z >= 0, z, alpha * z)
    q2_ref = jnp.clip(jnp.round(d * qs), -127, 127).astype(jnp.int8)
    want = np.asarray(qconv.conv3x3_s1_int8_reference(
        q2_ref, w2, scale, bias, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
