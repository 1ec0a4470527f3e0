"""Fused all-pairs siamese scoring engine.

Reference hot loop: ``utilities/generateMatrixDFW.py:28-36`` builds the
7771x7771 DFW score matrix *row by row* — 60.4M pair predictions issued as
7,771 separate Keras ``predict`` calls.  The same all-pairs pattern drives
selection mini-batches (``code/readDFW.py:222-244``) and the Multi-PIE
gallery identification (``code/ALINK_MTP.py:278-288``).

Here the whole grid is one device-resident computation.  For row features
``L (N, D)``, column features ``R (M, D)`` and the siamese head
``|l - r| -> Dense(H1) relu -> Dense(H2) relu -> Dense(2) softmax``
(``code/siamese.py:27-32``), the score ``P(genuine)`` of every (i, j) pair
is computed by:

- ``score_matrix_xla``    — blocked XLA implementation (lax.map over row
  blocks, inner map over column blocks).  Runs anywhere; used for CPU
  tests and as the fallback for very wide features (VGG16's 25088-d).
- ``score_matrix_pallas`` — a fused TPU kernel: each grid step loads a
  (TI, D) row tile and a (TJ, D) column tile into VMEM, materialises the
  |l - r| tile only on-chip, runs the whole MLP on the MXU with float32
  accumulation, and writes just the (TI, TJ) score tile back to HBM.  The
  (N*M, D) abs-difference tensor — 247 TB for the DFW matrix in f32 —
  never exists.
- ``score_matrix``        — dispatcher (pallas on TPU when D fits VMEM).
- ``score_matrix_sharded``— shard_map wrapper: rows sharded over the
  ``data`` mesh axis, columns over ``model``, zero collectives in the
  compute (each device owns an output tile).

The 2-class convention follows ``SiameseHead.logits``: P(genuine) =
``sigmoid(logit_1 - logit_0)`` == ``softmax(logits)[1]``, so the sigmoid
(py3 ``siamese3.py``) head works through the same kernel via its
``[0, logit]`` logits convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

# pad_axis0 is the one leading-axis padding policy (parallel/mesh.py):
# used here both for kernel block tiling (padded rows are sliced off the
# output) and for score_matrix_sharded's device-multiple padding.
from alink_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, pad_axis0 as _pad_to


def head_weights(params) -> tuple[tuple[jnp.ndarray, jnp.ndarray], ...]:
    """Extract ((W, b), ...) dense layers from flax ``SiameseHead`` params.

    Layers come out in application order: hidden_0, hidden_1, ..., out.
    The output layer is normalised to two columns: a sigmoid head's single
    logit column is prefixed with a zero column (see SiameseHead.logits).
    """
    p = params["params"] if "params" in params else params
    # Numeric sort: lexicographic would order hidden_10 before hidden_2.
    hidden = sorted((k for k in p if k.startswith("hidden_")),
                    key=lambda k: int(k.rsplit("_", 1)[1]))
    layers = [(jnp.asarray(p[k]["kernel"]), jnp.asarray(p[k]["bias"])) for k in hidden]
    wo, bo = jnp.asarray(p["out"]["kernel"]), jnp.asarray(p["out"]["bias"])
    if wo.shape[-1] == 1:
        wo = jnp.concatenate([jnp.zeros_like(wo), wo], axis=-1)
        bo = jnp.concatenate([jnp.zeros_like(bo), bo], axis=-1)
    return tuple(layers) + ((wo, bo),)


def _apply_head(x: jnp.ndarray, layers, dtype=jnp.bfloat16) -> jnp.ndarray:
    """MLP over |l - r| rows: returns P(genuine) per row."""
    for w, b in layers[:-1]:
        x = jnp.maximum(
            jnp.dot(x.astype(dtype), w.astype(dtype),
                    preferred_element_type=jnp.float32) + b, 0.0
        )
    wo, bo = layers[-1]
    logits = jnp.dot(x.astype(dtype), wo.astype(dtype),
                     preferred_element_type=jnp.float32) + bo
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])


def pair_scores(params, left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """P(genuine) for aligned feature pairs (N, D) x (N, D) -> (N,).

    The batched form of ``SiameseNetwork.predict`` (code/siamese.py:130-131)
    on pre-extracted features.
    """
    layers = head_weights(params)
    return _apply_head(jnp.abs(left - right), layers)


@partial(jax.jit, static_argnames=("row_block", "col_block"))
def score_matrix_xla(
    params,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    *,
    row_block: int = 128,
    col_block: int | None = None,
) -> jnp.ndarray:
    """Blocked XLA all-pairs scorer: (N, D) x (M, D) -> (N, M) P(genuine).

    ``col_block`` defaults adaptively: the mapped body materialises a
    (row_block, col_block, D) |l - r| tile, so the default bounds it at
    ~2^26 elements (~128 MB bf16) — 512 columns for typical feature
    widths, automatically narrower in the wide-feature fallback regime
    this path exists for (e.g. VGG16's 25088-d pool5 features, where a
    512-column tile would be 3.3 GB).
    """
    if col_block is None:
        col_block = max(8, min(512, (1 << 26) // (row_block * rows.shape[1])))
    layers = head_weights(params)
    n, m = rows.shape[0], cols.shape[0]
    rows_p = _pad_to(rows, row_block)
    cols_p = _pad_to(cols, col_block)
    rblocks = rows_p.reshape(-1, row_block, rows_p.shape[-1])
    cblocks = cols_p.reshape(-1, col_block, cols_p.shape[-1])

    def one_tile(rb, cb):
        x = jnp.abs(rb[:, None, :] - cb[None, :, :])
        s = _apply_head(x.reshape(-1, x.shape[-1]), layers)
        return s.reshape(rb.shape[0], cb.shape[0])

    def one_row_block(rb):
        return jax.lax.map(lambda cb: one_tile(rb, cb), cblocks)  # (Mb, R, C)

    tiles = jax.lax.map(one_row_block, rblocks)  # (Nb, Mb, R, C)
    out = tiles.transpose(0, 2, 1, 3).reshape(rows_p.shape[0], cols_p.shape[0])
    return out[:n, :m]


def _fused_kernel(rows_ref, cols_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  wo_ref, bo_ref, out_ref, slab_ref, *, d_chunk: int):
    """One (TI, TJ) score tile, whole head fused in VMEM.

    Mosaic constraint: no >2-D reshapes — the (TI, TJ, D) |l - r| block
    is laid out 2-D as a (TI * TJ, d_chunk) slab (row i's differences at
    slab rows [i*TJ, (i+1)*TJ)), built with static per-row broadcasts.
    The first dense layer is then ONE (TI*TJ, dc) @ (dc, H1) matmul per
    feature chunk and the rest of the head runs batched over all TI*TJ
    pairs — M = TI*TJ per MXU op instead of the per-row M = TJ of the
    first version, which measured 105 TFLOP/s against the chip's
    159 TFLOP/s matmul ceiling.
    """
    ti, d = rows_ref.shape
    tj = cols_ref.shape[0]
    nchunks = d // d_chunk

    h = None
    for c in range(nchunks):
        sl = pl.ds(c * d_chunk, d_chunk)
        r = cols_ref[:, sl]                      # (TJ, dc)
        for i in range(ti):
            slab_ref[i * tj:(i + 1) * tj, :] = jnp.abs(
                rows_ref[i:i + 1, sl] - r)       # broadcast over TJ
        p = jnp.dot(slab_ref[:], w1_ref[sl, :],
                    preferred_element_type=jnp.float32)
        h = p if h is None else h + p
    h = jnp.maximum(h + b1_ref[0, :], 0.0).astype(rows_ref.dtype)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[0, :], 0.0).astype(rows_ref.dtype)
    logits = jnp.dot(h, wo_ref[:], preferred_element_type=jnp.float32)
    logits = logits + bo_ref[0, :]
    diff = logits[:, 1] - logits[:, 0]           # (TI*TJ,)
    for i in range(ti):
        score = jax.nn.sigmoid(diff[i * tj:(i + 1) * tj])
        out_ref[i:i + 1, :] = score[None, :]


@partial(jax.jit,
         static_argnames=("row_block", "col_block", "d_chunk", "interpret"))
def score_matrix_pallas(
    params,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    *,
    row_block: int = 8,
    col_block: int = 256,
    d_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused TPU kernel for the all-pairs scorer.

    Supports the standard two-hidden-layer head (code/siamese.py:29-32).
    Feature dim is padded to a multiple of ``d_chunk``; |l-r| of padded
    lanes is 0 and contributes nothing.
    """
    layers = head_weights(params)
    if len(layers) != 3:
        raise ValueError("pallas scorer expects 2 hidden layers + output")
    (w1, b1), (w2, b2), (wo, bo) = layers
    n, m = rows.shape[0], cols.shape[0]
    d = rows.shape[1]

    dc = min(d_chunk, d)
    dpad = (-d) % dc
    if dpad:
        zr = jnp.zeros((rows.shape[0], dpad), rows.dtype)
        zc = jnp.zeros((cols.shape[0], dpad), cols.dtype)
        rows = jnp.concatenate([rows, zr], axis=1)
        cols = jnp.concatenate([cols, zc], axis=1)
        w1 = jnp.concatenate([w1, jnp.zeros((dpad, w1.shape[1]), w1.dtype)])
    rows_p = _pad_to(rows, row_block).astype(jnp.bfloat16)
    cols_p = _pad_to(cols, col_block).astype(jnp.bfloat16)
    np_, mp_ = rows_p.shape[0], cols_p.shape[0]
    dp = rows_p.shape[1]

    # Pad the small head widths up to the 128-lane boundary so every matmul
    # operand is tile-aligned; zero pads are exact no-ops through relu/dot.
    def pad_cols(w, b, to):
        pad = (-w.shape[1]) % to
        if pad:
            w = jnp.concatenate([w, jnp.zeros((w.shape[0], pad), w.dtype)], axis=1)
            b = jnp.concatenate([b, jnp.zeros((pad,), b.dtype)])
        return w, b

    w1p, b1p = pad_cols(w1, b1, 128)
    w2p, b2p = pad_cols(w2, b2, 128)
    w2p = jnp.concatenate(
        [w2p, jnp.zeros((w1p.shape[1] - w2p.shape[0], w2p.shape[1]), w2p.dtype)]
    )
    wop, bop = pad_cols(wo, bo, 128)
    wop = jnp.concatenate(
        [wop, jnp.zeros((w2p.shape[1] - wop.shape[0], wop.shape[1]), wop.dtype)]
    )

    grid = (np_ // row_block, mp_ // col_block)
    const = lambda i, j: (0, 0)  # noqa: E731 — weights resident across steps

    out = pl.pallas_call(
        partial(_fused_kernel, d_chunk=dc),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        grid=grid,
        scratch_shapes=[
            pltpu.VMEM((row_block * col_block, dc), jnp.bfloat16),
        ],
        in_specs=[
            pl.BlockSpec((row_block, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_block, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, w1p.shape[1]), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1p.shape[1]), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2p.shape[1]), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wop.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wop.shape[1]), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, col_block), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * mp_ * dp * w1p.shape[1],
            bytes_accessed=(np_ * dp + mp_ * dp) * 2 + np_ * mp_ * 4,
            transcendentals=np_ * mp_,
        ),
        interpret=interpret,
    )(
        rows_p,
        cols_p,
        w1p.astype(jnp.bfloat16),
        b1p.reshape(1, -1).astype(jnp.float32),
        w2p.astype(jnp.bfloat16),
        b2p.reshape(1, -1).astype(jnp.float32),
        wop.astype(jnp.bfloat16),
        bop.reshape(1, -1).astype(jnp.float32),
    )
    return out[:n, :m]


# The fused kernel keeps (row tile, col tile, W1, |l-r| chunk, hidden acc)
# in VMEM; beyond this feature width it would spill, so fall back to XLA.
_PALLAS_MAX_D = 4096


def score_matrix(params, rows, cols, *, on_tpu: bool | None = None,
                 **kwargs) -> jnp.ndarray:
    """All-pairs P(genuine): pallas-fused on TPU, blocked XLA elsewhere.

    ``on_tpu`` overrides backend detection (needed when running on a CPU
    mesh while the default backend is a TPU, e.g. multi-chip dry runs).
    """
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    layers = head_weights(params)
    if on_tpu and len(layers) == 3 and rows.shape[1] <= _PALLAS_MAX_D:
        rb = kwargs.get("row_block", 8)
        cb = kwargs.get("col_block") or 256  # None = "adaptive" (XLA-only
        # semantics) — the fused kernel takes its own default instead.
        kwargs["col_block"] = cb
        if rb * cb > 4096:
            # Block sizes are PER-BACKEND tuning: the XLA path's
            # defaults (128, 512) describe an HBM tile, but here they
            # would size the kernel's VMEM slab+accumulator past the
            # ~16 MB budget and die inside Mosaic.  Fail with the
            # contract instead.
            raise ValueError(
                f"row_block*col_block = {rb}*{cb} exceeds the fused "
                "kernel's VMEM budget (<= 4096 pairs/tile); block "
                "sizes are per-backend — call score_matrix_pallas/"
                "score_matrix_xla directly to tune one backend")
        return score_matrix_pallas(params, rows, cols, **kwargs)
    kwargs.pop("d_chunk", None)
    kwargs.pop("interpret", None)  # pallas-only knob
    return score_matrix_xla(params, rows, cols, **kwargs)


def score_matrix_sharded(
    mesh: Mesh,
    params,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """Mesh-sharded all-pairs scorer.

    Rows are sharded over ``data``, columns over ``model``; every device
    computes its own (N/data, M/model) output tile with zero communication
    during compute (the natural 2-D decomposition of the score grid —
    SURVEY.md section 5.7's "sequence parallelism" equivalent).
    """
    nd = mesh.shape[DATA_AXIS]
    nm = mesh.shape[MODEL_AXIS]
    n, m = rows.shape[0], cols.shape[0]
    rows = jax.device_put(_pad_to(jnp.asarray(rows), nd),
                          jax.NamedSharding(mesh, P(DATA_AXIS, None)))
    cols = jax.device_put(_pad_to(jnp.asarray(cols), nm),
                          jax.NamedSharding(mesh, P(MODEL_AXIS, None)))
    params = jax.device_put(params, jax.NamedSharding(mesh, P()))
    on_tpu = mesh.devices.flat[0].platform == "tpu"

    fn = shard_map(
        lambda p, r, c: score_matrix(p, r, c, on_tpu=on_tpu, **kwargs),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(MODEL_AXIS, None)),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,
    )
    return fn(params, rows, cols)[:n, :m]


def identification_topk(
    params,
    probes: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery matches per probe (ALINK_MTP.py:278-288's argmax loop
    as one scored matrix + top_k)."""
    scores = score_matrix(params, probes, gallery)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx
