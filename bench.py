"""Benchmark: the north-star metric — detect+align+embed faces/sec/chip.

BASELINE.json's target is >=10k detected+aligned+embedded 112x112
faces/sec/chip.  This benchmark runs the full pipeline — fixed-budget
MTCNN cascade over raw images, best-face template alignment, and the
bf16 ArcFace embedding, all as ONE jitted program
(``FaceModel.pipeline``) — in FOUR configurations:

- ``r34``  — LResNet34E-IR embedder, typical budgets: the fastest
  real-checkpoint configuration the zoo supports (insightface r34,
  8.9 GFLOP/face; converted by the same depth-inferring
  tools/convert_mxnet.py).  ``value``/``vs_baseline`` ride the best
  supported configuration, which is this one.
- ``r50``  — LResNet50E-IR embedder, typical budgets (12.6 GFLOP).
  Physics note: its bf16 embed alone measures 4.8 ms/64 at the chip's
  matmul ceiling — 75% of the 6.4 ms/64 a 10k rate allows — so 10k on
  r50 would need the entire cascade+align in under 1.6 ms/64, below
  the measured floor of its components; the 10k target is reachable
  on this chip only by a smaller embedder (BENCHMARKS.md round-4).
- ``r100`` — LResNet100E-II embedder, typical budgets: the checkpoint
  the reference de-facto deploys (code/face_model.py:28-41); the
  round-1/2 continuity number.
- ``worst_case`` — r50 embedder under the lossless dense-scene budgets
  (CascadeConfig.worst_case): the profile ceiling for crowd imagery.

Reference equivalent: MTCNN in Python/MXNet at batch=1 with host NMS per
pyramid level (``code/mtcnn_detector.py:307-513``) + batch=1 MXNet
embedding with a per-image Python loop (``code/face_model.py:39``,
``code/siamese.py:232-234``).

Measurement notes: host<->device round trips through the device tunnel
cost tens of ms, so each measurement chains iterations inside ONE jit via
``lax.fori_loop`` (serialised by a scalar data dependency), forces
completion with a single scalar fetch, and subtracts the separately
measured n=0 dispatch+fetch overhead.  A wall-clock budget guard skips
the later configurations (reporting null) rather than blow the driver's
step timeout on a cold compile cache — priority order r50, r100,
worst_case, embed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_FACES_PER_SEC = 10_000.0
WALL_BUDGET_S = 1500.0
_T0 = time.monotonic()


def _sync(x) -> float:
    """Force device completion via a scalar host fetch."""
    return float(jnp.ravel(x.astype(jnp.float32))[0])


def _timed_chain(fn, x, iters):
    """Per-batch seconds for ``fn`` with tunnel-latency amortisation."""

    @jax.jit
    def chain(imgs, n):
        def body(i, carry):
            im, acc = carry
            out = fn(im)
            return im + 0.0 * acc, acc + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

    _sync(chain(x, 2))  # compile + warm-up
    t0 = time.perf_counter()
    _sync(chain(x, 0))
    overhead = time.perf_counter() - t0  # dispatch + fetch latency
    t0 = time.perf_counter()
    _sync(chain(x, iters))
    return max(time.perf_counter() - t0 - overhead, 1e-9) / iters


def _backend_watchdog(timeout_s: float = 600.0):
    """Emit an explicit error record if backend *init* hangs.

    A dead remote-device tunnel blocks ``jax.devices()`` forever (seen
    live: >10 min with no error), which would leave the driver's bench
    step with no output at all.  The watchdog covers only backend
    bring-up — compiles can legitimately take minutes and must not trip
    it.  Returns a cancel() fn to call once devices() has returned.
    """
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "detect_align_embed_throughput",
                "value": 0.0,
                "unit": "faces/sec/chip",
                "vs_baseline": 0.0,
                "error": f"device backend init exceeded {timeout_s:.0f}s "
                         "(tunnel unavailable)",
            }), flush=True)
            import os
            os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def main() -> None:
    try:
        # Persistent compile cache: repeated driver runs skip the ~minutes
        # of remote AOT compilation.
        jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cancel_watchdog = _backend_watchdog()
    jax.devices()  # force backend bring-up under the watchdog
    cancel_watchdog()

    from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
    from alink_tpu.models import (ArcFaceResNet34, ArcFaceResNet50,
                                  ArcFaceResNet100)

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 2   # measured sweet spot (BENCHMARKS.md)
    iters = 20 if on_tpu else 1
    size = 160                     # typical pre-crop face image

    if on_tpu:
        r34 = ArcFaceResNet34()
        r50 = ArcFaceResNet50()
        r100 = ArcFaceResNet100()
    else:  # CPU smoke run: tiny depth, same code path
        r34 = ArcFaceResNet100(stage_sizes=(1, 1, 1, 1))
        r50 = r34
        r100 = r34
    p34 = r34.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    p50 = (p34 if not on_tpu
           else r50.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))))
    p100 = (p34 if not on_tpu
            else r100.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 112, 112, 3))))
    cparams = init_cascade_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3),
                           jnp.float32, 0.0, 255.0)

    # Random weights with open thresholds: every budget slot does work,
    # so the measured cascade cost is each profile's worst case.  (The
    # O-Net landmark head is seeded at the mean-face prior so alignment
    # geometry is realistic — init_cascade_params.)
    typical = CascadeConfig.typical(thresholds=(0.0, 0.0, 0.0))
    dense = CascadeConfig.worst_case(thresholds=(0.0, 0.0, 0.0))

    def run_config(embedder, params, cfg):
        if time.monotonic() - _T0 > WALL_BUDGET_S:
            return None  # cold-cache guard: keep the priority numbers
        fm = FaceModel(params, cparams, cfg, embedder=embedder)
        sec = _timed_chain(
            lambda im: fm.pipeline(params, cparams, im), x, iters)
        return batch / sec

    r34_fps = run_config(r34, p34, typical)
    r50_fps = run_config(r50, p50, typical)
    r100_fps = run_config(r100, p100, typical)
    dense_fps = run_config(r50, p50, dense)

    embed_fps = None
    if time.monotonic() - _T0 <= WALL_BUDGET_S:
        chips = jax.random.uniform(jax.random.PRNGKey(3),
                                   (batch, 112, 112, 3), jnp.float32,
                                   0.0, 255.0)
        sec_embed = _timed_chain(
            lambda im: r50.apply(p50, im), chips, iters + 10)
        embed_fps = batch / sec_embed

    best = max([v for v in (r34_fps, r50_fps, r100_fps) if v is not None],
               default=0.0)
    rnd = lambda v: None if v is None else round(v, 1)  # noqa: E731
    print(json.dumps({
        "metric": "detect_align_embed_throughput",
        "value": rnd(best) or 0.0,
        "unit": "faces/sec/chip",
        "vs_baseline": round((best or 0.0) / NORTH_STAR_FACES_PER_SEC, 3),
        "r34_faces_per_sec": rnd(r34_fps),
        "r50_faces_per_sec": rnd(r50_fps),
        "r100_faces_per_sec": rnd(r100_fps),
        "worst_case_faces_per_sec": rnd(dense_fps),
        "embed_only_faces_per_sec_r50": rnd(embed_fps),
        "batch": batch,
        "image_size": size,
    }))


if __name__ == "__main__":
    main()
