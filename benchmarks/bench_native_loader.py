"""Host-ingest benchmark: native C++ loader vs PIL, exact vs DCT-scaled.

The chip pipeline runs at thousands of faces/s; the host has to decode
that many JPEGs/s to feed it (readDFW.py:82's per-image PIL loop is the
reference's ingest).  This measures imgs/s/core at two source sizes:
near-target (200x180, scaling never engages) and camera-sized (800x640,
where libjpeg's fractional-DCT decode engages at 1/4).

Prints one JSON line per (source, mode).  CPU-only — no TPU needed.
"""

import json
import os
import time

import numpy as np
from PIL import Image

from alink_tpu.data import native_loader


def synth_jpegs(d, n, w, h, seed):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        base = rng.normal(128, 40, (24, 24, 3)).clip(0, 255)
        img = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
            (w, h), Image.BILINEAR))
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def timed(fn, n):
    fn()  # warm (page cache, pool)
    t0 = time.perf_counter()
    fn()
    return n / (time.perf_counter() - t0)


def main():
    assert native_loader.available(), "native loader not built"
    target = (160, 160)
    for name, (w, h, n) in (("near_target", (200, 180, 512)),
                            ("camera", (800, 640, 128))):
        paths = synth_jpegs(f"/tmp/ingest_bench_{name}", n, w, h, seed=7)
        rates = {
            "native_exact": timed(lambda: native_loader.decode_resize_batch(
                paths, target), n),
            "native_dct_scale": timed(
                lambda: native_loader.decode_resize_batch(
                    paths, target, dct_scale=True), n),
            "pil": timed(lambda: [np.asarray(
                Image.open(p).convert("RGB").resize(target, Image.BILINEAR),
                np.float32) for p in paths], n),
        }
        for mode, r in rates.items():
            print(json.dumps({
                "metric": "host_ingest_throughput",
                "source": f"{w}x{h}", "mode": mode,
                "threads": min(16, os.cpu_count() or 1),
                "value": round(r, 1), "unit": "imgs/s",
            }), flush=True)


if __name__ == "__main__":
    main()
