"""Tests for the fused all-pairs scoring engine (ops/pairwise.py).

Reference behaviour being validated: the score matrix of
utilities/generateMatrixDFW.py:28-36 — entry (i, j) is the siamese head's
P(genuine) for (row_i, col_j) — computed blockwise/fused instead of
row-by-row.
"""

import jax
import jax.numpy as jnp
import pytest

from alink_tpu.models import SiameseHead
from alink_tpu.ops import pairwise


@pytest.fixture(scope="module")
def head_and_params():
    head = SiameseHead(dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 96)),
                       jnp.zeros((1, 96)))
    return head, params


@pytest.fixture(scope="module")
def feats():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return (jax.random.normal(k1, (37, 96)), jax.random.normal(k2, (53, 96)))


def _reference_matrix(head, params, rows, cols):
    """Direct per-row apply — the shape of the reference's Python loop."""
    return jax.vmap(
        lambda l: head.apply(params, jnp.tile(l[None], (cols.shape[0], 1)),
                             cols)[:, 1]
    )(rows)


def test_xla_matches_direct_apply(head_and_params, feats):
    head, params = head_and_params
    rows, cols = feats
    ref = _reference_matrix(head, params, rows, cols)
    got = pairwise.score_matrix_xla(params, rows, cols, row_block=16,
                                    col_block=32)
    assert got.shape == (37, 53)
    # bf16 compute inside the blocked path vs f32 reference.
    assert jnp.max(jnp.abs(ref - got)) < 2e-2


def test_pallas_interpret_matches_xla(head_and_params, feats):
    _, params = head_and_params
    rows, cols = feats
    xla = pairwise.score_matrix_xla(params, rows, cols, row_block=16,
                                    col_block=32)
    pls = pairwise.score_matrix_pallas(
        params, rows, cols, row_block=16, col_block=128, d_chunk=128,
        interpret=True,
    )
    assert jnp.max(jnp.abs(xla - pls)) < 2e-2


def test_feature_padding_is_exact(head_and_params):
    """d_chunk padding adds |0-0| lanes with zero W1 rows — must be a no-op."""
    _, params = head_and_params
    rows = jax.random.normal(jax.random.PRNGKey(2), (8, 96))
    a = pairwise.score_matrix_pallas(params, rows, rows, row_block=8,
                                     col_block=128, d_chunk=96, interpret=True)
    b = pairwise.score_matrix_pallas(params, rows, rows, row_block=8,
                                     col_block=128, d_chunk=64, interpret=True)
    assert jnp.max(jnp.abs(a - b)) < 1e-5


def test_dispatcher_accepts_adaptive_col_block(head_and_params, feats):
    """col_block=None (score_matrix_xla's adaptive default) must route
    through BOTH dispatcher branches without a TypeError (review fix:
    the pallas VMEM guard used to multiply None)."""
    _, params = head_and_params
    rows, cols = feats
    xla = pairwise.score_matrix(params, rows, cols, on_tpu=False,
                                col_block=None)
    pls = pairwise.score_matrix(params, rows, cols, on_tpu=True,
                                col_block=None, interpret=True)
    assert xla.shape == pls.shape == (37, 53)
    assert jnp.max(jnp.abs(xla - pls)) < 2e-2


def test_sharded_matches_single(head_and_params, feats, mesh8):
    _, params = head_and_params
    rows, cols = feats
    single = pairwise.score_matrix_xla(params, rows, cols, row_block=16,
                                       col_block=32)
    sharded = pairwise.score_matrix_sharded(mesh8, params, rows, cols,
                                            row_block=16, col_block=32)
    assert sharded.shape == single.shape
    assert jnp.max(jnp.abs(single - sharded)) < 1e-5


def test_sigmoid_head_convention():
    """The py3 sigmoid head (siamese3.py) flows through the same scorer."""
    head = SiameseHead(head="sigmoid", dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(3), jnp.zeros((1, 32)),
                       jnp.zeros((1, 32)))
    rows = jax.random.normal(jax.random.PRNGKey(4), (9, 32))
    probs = head.apply(params, rows, rows)[:, 1]
    diag = jnp.diagonal(
        pairwise.score_matrix_xla(params, rows, rows, row_block=8,
                                  col_block=8)
    )
    assert jnp.max(jnp.abs(probs - diag)) < 2e-2


def test_pair_scores_diagonal(head_and_params, feats):
    _, params = head_and_params
    rows, _ = feats
    mat = pairwise.score_matrix_xla(params, rows, rows, row_block=16,
                                    col_block=16)
    ps = pairwise.pair_scores(params, rows, rows)
    assert jnp.max(jnp.abs(jnp.diagonal(mat) - ps)) < 1e-2


def test_identification_topk(head_and_params):
    _, params = head_and_params
    gallery = jax.random.normal(jax.random.PRNGKey(5), (11, 96))
    # Probes equal to gallery entries should match themselves best
    # (|l - r| = 0 gives a fixed score; ties aside, shape contract holds).
    vals, idx = pairwise.identification_topk(params, gallery, gallery, k=3)
    assert vals.shape == (11, 3)
    assert idx.shape == (11, 3)
    assert bool(jnp.all(vals[:, 0] >= vals[:, 1]))


def test_pallas_multi_block_grid(head_and_params):
    """Multiple row AND column tiles — regression for the column index_map
    bug that only manifested with >1 column block."""
    _, params = head_and_params
    rows = jax.random.normal(jax.random.PRNGKey(7), (20, 96))
    cols = jax.random.normal(jax.random.PRNGKey(8), (300, 96))
    xla = pairwise.score_matrix_xla(params, rows, cols, row_block=16,
                                    col_block=64)
    pls = pairwise.score_matrix_pallas(params, rows, cols, row_block=8,
                                       col_block=128, d_chunk=96,
                                       interpret=True)
    assert pls.shape == (20, 300)
    assert jnp.max(jnp.abs(xla - pls)) < 2e-2
