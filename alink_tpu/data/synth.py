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

# The scanner's qualifying-capture filter (readMTP.py:9-14) is the single
# source of truth — the MTP fixture must stay in sync with scan_mtp.
from alink_tpu.data.manifest import _MTP_SUFFIXES


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
    suffixes = _MTP_SUFFIXES
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


def make_synthetic_dfw_test(
    root: str,
    *,
    num_people: int = 6,
    plain_per_person: int = 2,
    disguised_per_person: int = 2,
    impostors_per_person: int = 1,
    image_size: int = 32,
    test_folder: str = "Testing_data",
    seed: int = 1,
):
    """Write a DFW *testing* protocol: image tree + face-name list + mask.

    Mirrors the artifacts the real DFW evaluation consumes
    (``utilities/generatePredictions.py:56`` reads
    ``Testing_data_face_name.txt``; ``utilities/ROC_precompute.py:19-40``
    reads the positional mask with codes 1-4).  The mask codes here are a
    documented synthetic approximation of the DFW protocol's split —
    what the regression needs is a self-consistent positional mask with
    the right genuine/imposter polarity in all four codes:

    - same person, both plain                  -> 1 (genuine, impersonation ROC)
    - same person, either disguised (``_h_``)  -> 2 (genuine, obfuscation ROC)
    - any pair involving an impostor (``_I_``) -> 3 (imposter, impersonation)
    - cross-person, either disguised           -> 4 (imposter, obfuscation)
    - cross-person both plain                  -> 3
    - two impostors of the SAME target         -> 0 (unscored: the
      synthesiser gives them one shared base pattern, so neither
      polarity would be truthful)

    Returns ``(prefix, names, mask)``: the dataset prefix, the face-name
    list (relative paths, written to ``Testing_data_face_name.txt``
    under ``root``), and the (N, N) int mask (written to
    ``updated_testing_mask.txt`` under ``root``).
    """
    rng = np.random.default_rng(seed)
    base_dir = os.path.join(root, test_folder)
    names: list[str] = []
    kinds: list[tuple[str, int]] = []  # (kind, person)
    for p in range(num_people):
        pdir = os.path.join(base_dir, f"person_{p:03d}")
        os.makedirs(pdir, exist_ok=True)
        base = rng.uniform(0, 255, (image_size, image_size, 3))
        impostor_base = rng.uniform(0, 255, (image_size, image_size, 3))
        for i in range(plain_per_person):
            fn = f"img_{i}.jpg"
            Image.fromarray(_person_image(rng, base, 0.05)).save(
                os.path.join(pdir, fn))
            names.append(f"{test_folder}/person_{p:03d}/{fn}")
            kinds.append(("plain", p))
        for i in range(disguised_per_person):
            fn = f"img_h_{i}.jpg"
            Image.fromarray(_person_image(rng, base, 0.20)).save(
                os.path.join(pdir, fn))
            names.append(f"{test_folder}/person_{p:03d}/{fn}")
            kinds.append(("dig", p))
        for i in range(impostors_per_person):
            fn = f"img_I_{i}.jpg"
            Image.fromarray(_person_image(rng, impostor_base, 0.05)).save(
                os.path.join(pdir, fn))
            names.append(f"{test_folder}/person_{p:03d}/{fn}")
            kinds.append(("imp", p))

    n = len(names)
    mask = np.zeros((n, n), np.int64)
    for i in range(n):
        ki, pi = kinds[i]
        for j in range(i + 1, n):
            kj, pj = kinds[j]
            imp = "imp" in (ki, kj)
            dig = "dig" in (ki, kj)
            if ki == kj == "imp":
                code = 0 if pi == pj else 3
            elif imp:
                code = 3
            elif pi == pj:
                code = 2 if dig else 1
            else:
                code = 4 if dig else 3
            mask[i, j] = mask[j, i] = code

    with open(os.path.join(root, f"{test_folder}_face_name.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    np.savetxt(os.path.join(root, "updated_testing_mask.txt"), mask,
               fmt="%d")
    return root, names, mask
