"""Synthetic DFW/MTP-shaped fixture datasets.

The reference has no tests and no fixtures (SURVEY.md section 4); its
dataset protocols are trivial to synthesise — the DFW ``_h_``/``_I_``
filename markers (readDFW.py:87-94) and the Multi-PIE qualifying suffixes
(readMTP.py:9-14).  These writers create real image trees on disk so the
manifest -> loader -> pairs pipeline is exercised end to end.

Identities are separable by construction: every image of person ``p`` is a
noisy copy of a per-person base pattern, so verification models can learn
the task and integration tests can assert above-chance behaviour.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _person_image(rng, base: np.ndarray, noise: float) -> np.ndarray:
    img = base + rng.normal(0.0, noise * 255.0, base.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_dfw(
    root: str,
    *,
    num_people: int = 6,
    plain_per_person: int = 3,
    disguised_per_person: int = 4,
    impostors_per_person: int = 2,
    image_size: int = 32,
    train_folder: str = "Training_data",
    seed: int = 0,
) -> str:
    """Write a DFW-protocol tree; returns the dataset prefix (``root``)."""
    rng = np.random.default_rng(seed)
    base_dir = os.path.join(root, train_folder)
    for p in range(num_people):
        pdir = os.path.join(base_dir, f"person_{p:03d}")
        os.makedirs(pdir, exist_ok=True)
        base = rng.uniform(0, 255, (image_size, image_size, 3))
        # Disguised images share the identity pattern but heavier noise;
        # impostors are entirely different patterns (other identities).
        impostor_base = rng.uniform(0, 255, (image_size, image_size, 3))
        for i in range(plain_per_person):
            Image.fromarray(_person_image(rng, base, 0.05)).save(
                os.path.join(pdir, f"img_{i}.jpg")
            )
        for i in range(disguised_per_person):
            Image.fromarray(_person_image(rng, base, 0.20)).save(
                os.path.join(pdir, f"img_h_{i}.jpg")
            )
        for i in range(impostors_per_person):
            Image.fromarray(_person_image(rng, impostor_base, 0.05)).save(
                os.path.join(pdir, f"img_I_{i}.jpg")
            )
    return root


def make_synthetic_mtp(
    root: str,
    *,
    num_subjects: int = 5,
    image_size: int = 48,
    seed: int = 0,
) -> str:
    """Write a flat Multi-PIE-protocol directory (qualifying suffixes only);
    returns ``root``."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    suffixes = (
        "01_01_051_06.png",
        "02_01_051_06.png",
        "01_01_051_08.png",
        "02_01_051_08.png",
    )
    for subject in range(1, num_subjects + 1):
        base = rng.uniform(0, 255, (image_size, image_size, 3))
        for suffix in suffixes:
            img = _person_image(rng, base, 0.05)
            Image.fromarray(img).save(
                os.path.join(root, f"{subject:03d}_{suffix}")
            )
        # A non-qualifying file the scanner must ignore.
        Image.fromarray(_person_image(rng, base, 0.05)).save(
            os.path.join(root, f"{subject:03d}_01_01_140_07.png")
        )
    return root
