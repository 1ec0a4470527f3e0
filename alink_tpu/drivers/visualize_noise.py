"""Render a noise channel onto an image (reference: code/visualize_noise.py).

The reference loads one hard-coded image, applies Perlin noise and writes
``lol.png`` (:11-15).  This driver takes the image, channel and output path
as flags and supports every registered channel.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from alink_tpu.ops.noise import get_relevant_noise


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image", required=True, help="input image path")
    parser.add_argument("--noise", default="perlin",
                        help="channel name (noise.get_relevant_noise)")
    parser.add_argument("--out", default="noise_preview.png")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32)
    fn = get_relevant_noise(args.noise)
    noisy = fn(jax.random.PRNGKey(args.seed), jnp.asarray(img)[None])[0]
    out = np.clip(np.asarray(noisy), 0, 255).astype(np.uint8)
    Image.fromarray(out).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
