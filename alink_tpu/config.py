"""Configuration dataclasses mirroring the reference's flag systems.

The reference configures each driver with TF flags
(``code/ALINK.py:37-62``, ``code/ALINK_MTP.py:47-72``,
``code/existing_al.py:29-41``).  Knob names are kept 1:1 so experiments
transfer directly; hard-coded module constants (``IMAGERES``/``FEATURERES``,
``ALINK.py:28-33``; ``GlobalConstants``, ``ALINK_MTP.py:36-43``) become
explicit fields.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ALinkConfig:
    """A-LINK / A2-LINK loop configuration (reference: code/ALINK.py:37-62).

    Defaults match the reference driver flag defaults exactly.
    """

    # Paths (reference: ALINK.py:37-42)
    data_dir_prefix: str = "DFW_Data/"
    train_images_dir: str = "Training_data"
    test_images_dir: str = "Testing_data"
    out_model: str = "models/postALINK"
    ensemble_basepath: str = "models/ensemble"
    disguised_basemodel: str = "models/disguisedModel"

    # Noise bank, comma-separated in the reference (ALINK.py:43).
    noise: Sequence[str] = (
        "gaussian",
        "saltpepper",
        "poisson",
        "speckle",
        "adversarial",
    )

    # Training schedule (ALINK.py:45-52)
    ft_epochs: int = 3
    batch_size: int = 16
    dig_epochs: int = 40
    undig_epochs: int = 60
    batch_send: int = 64
    mixture_ratio: int = 2
    alink_bs: int = 16
    num_ensemble_models: int = 1

    # Selection knobs (ALINK.py:54-57)
    active_ratio: float = 1.0
    split_ratio: float = 0.5
    disparity_ratio: float = 0.25
    eps: float = 0.05

    # Behaviour toggles (ALINK.py:59-62)
    augment: bool = False
    refine_models: bool = False
    train_disguised_model: bool = False
    blind_strategy: bool = False

    # Geometry (module constants at ALINK.py:28-32)
    image_res: tuple[int, int] = (224, 224)
    feature_res: int = 2048

    # TPU-native additions (no reference counterpart; SURVEY.md section 7):
    seed: int = 42  # reference seeds TF with 42 (ALINK.py:19)
    mesh_shape: tuple[int, ...] = (-1,)  # -1 => all devices on the data axis
    dtype: str = "bfloat16"  # compute dtype for backbones
    # Demo mode: > 0 generates a synthetic DFW-protocol tree with this
    # many people (data/synth.py) and runs the complete system against
    # it — no dataset download needed to exercise every code path.
    synthetic_people: int = 0
    # Samples per training epoch for the M2/ensemble pretraining stages
    # (the reference hard-codes 320000, siamese.py:44-50).  Demo runs on
    # synthetic trees should set something tiny (e.g. 256).
    train_steps: int = 320000
    # Mid-loop fault tolerance (SURVEY.md section 5.3; the reference
    # loses all selection state on interruption, ALINK.py:135-143):
    # when set, the loop auto-resumes from this path and checkpoints
    # every checkpoint_every iterations (RNG-exact resume).
    loop_checkpoint: str = ""
    checkpoint_every: int = 1
    # Supervised restarts (utils/resilience.py): on a retryable runtime
    # failure (device halt, preemption, transient IO) the driver rebuilds
    # the loop and resumes from loop_checkpoint, at most this many times.
    # Requires loop_checkpoint; 0 disables supervision.
    max_restarts: int = 0
    # Pairs per fused selection-chunk dispatch.  Measured tradeoff
    # (BENCHMARKS.md "ResNet50 batch-size curve"): VGGFace-ResNet50's
    # per-image throughput FALLS with batch (71.8 TF/s at image batch
    # 128 vs 44.1 at 1024 — HBM working set), so a locally-attached
    # host gets the best selection round from small chunks
    # (device_batch=64 -> 128-image featurizer calls).  Through a
    # high-latency link (e.g. a remote-device tunnel at ~35 ms/dispatch)
    # the extra dispatches dominate and large chunks win — hence the
    # conservative default.  Tune per deployment; bench_selection.py
    # measures both modes.  The actual chunk width buckets to the next
    # power of two <= device_batch, so small slabs neither retrace the
    # fused chunk program nor pad all the way up.  ``"auto"`` resolves
    # the knob at loop construction with a one-time dispatch-latency
    # probe (utils/dispatch.py): small chunks on low-latency hosts,
    # large through a remote tunnel.
    device_batch: int | str = 1024
    # Host ingest: decode large JPEGs at the biggest 1/2^k DCT scale
    # that still covers image_res (native loader only; ~1.8x per core
    # on camera-sized photos, BENCHMARKS.md "Host ingest").  Off by
    # default — the scaled decode approximates the full-resolution
    # pixels, so keep it off when bit-parity with the PIL path matters.
    ingest_dct_scale: bool = False
    # Compile the frozen teacher featurizer's residual stages as lax.scan
    # bodies: ~5x faster cold-start compile, identical numerics
    # (docs/TUNING.md "Compilation").
    featurize_scan_units: bool = False
    # Debug-mode numeric sanitizer (utils/debug.py; SURVEY.md section
    # 5.2): check the selection outputs and finetuned student params for
    # NaN/Inf after each guarded phase and raise FloatingPointError at
    # the first offender.  Costs one device round trip per phase — a
    # debug mode, not an always-on assert.
    debug_nans: bool = False

    def __post_init__(self):
        if isinstance(self.device_batch, str):
            if self.device_batch != "auto":
                raise ValueError(
                    "device_batch must be a positive int or 'auto'")
        elif self.device_batch <= 0:
            raise ValueError("device_batch must be positive")
        if not (0.0 <= self.split_ratio <= 1.0):  # ALINK.py:74
            raise ValueError("split_ratio must be in [0, 1]")
        if not (0.0 <= self.disparity_ratio <= 1.0):  # ALINK.py:75
            raise ValueError("disparity_ratio must be in [0, 1]")
        if not (0.0 <= self.eps < 0.5):  # ALINK.py:76
            raise ValueError("eps must be in [0, 0.5)")
        if self.max_restarts > 0 and not self.loop_checkpoint:
            # Fail at config time, not hours later after data staging
            # and model pretraining (drivers/alink.py runs those first).
            raise ValueError("max_restarts requires loop_checkpoint")


@dataclasses.dataclass(frozen=True)
class ALinkArcConfig(ALinkConfig):
    """ArcFace driver configuration (reference: code/ALINK_arc.py:28-60).

    Same knobs as the DFW driver; differing defaults: 112x112 inputs,
    512-d L2-normalised embeddings, perlin added to the noise bank
    (ALINK_arc.py:41), and its own model paths.
    """

    out_model: str = "models/postALINK_arc"
    ensemble_basepath: str = "models/ensemble_arc"
    disguised_basemodel: str = "models/disguisedModel_arc"
    noise: Sequence[str] = (
        "gaussian",
        "saltpepper",
        "poisson",
        "perlin",
        "speckle",
        "adversarial",
    )
    image_res: tuple[int, int] = (112, 112)
    feature_res: int = 512
    # LResNet depth for the embedder: 34/50/100 from the insightface zoo
    # (the reference's --model flag points at whichever checkpoint was
    # downloaded, face_model.py:28-41; r100 is its de-facto default).
    # r50 halves the embed FLOPs — see models/arcface.py.
    embed_depth: int = 100
    # Compile each stage's stride-1 IR units as one lax.scan body:
    # ~5x faster cold-start compiles, identical numerics (docs/TUNING.md
    # "Compilation").  Checkpoints restore through models.stack_ir_params.
    embed_scan_units: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.embed_depth not in (34, 50, 100):
            raise ValueError(
                f"embed_depth must be 34, 50 or 100 (the LResNet zoo), "
                f"got {self.embed_depth}")


@dataclasses.dataclass(frozen=True)
class MTPConfig:
    """Multi-PIE cross-resolution variant (reference: code/ALINK_MTP.py:47-72).

    The domain gap here is resolution: a 224x224 teacher and a low-res
    (default 48x48) student, instead of plain vs. disguised faces.
    """

    data_dir_prefix: str = "MultiPieSplits/split1/train"
    test_dir: str = "MultiPieSplits/split1/test"
    out_model: str = "MTP_models/postALINK"
    ensemble_basepath: str = "MTP_models/ensemble"
    lowres_basemodel: str = "MTP_models/lowresModel"
    noise: Sequence[str] = ("adversarial",)  # ALINK_MTP.py:53

    low_res: int = 48  # ALINK_MTP.py:55 ("lowRes")
    ft_epochs: int = 3
    batch_size: int = 16
    lowres_epochs: int = 10
    highres_epochs: int = 5
    batch_send: int = 32
    mixture_ratio: int = 1
    alink_bs: int = 8
    num_ensemble_models: int = 1

    active_ratio: float = 1.0
    split_ratio: float = 0.5
    disparity_ratio: float = 0.25
    eps: float = 0.1  # ALINK_MTP.py:68 (differs from the DFW driver's 0.05)

    augment: bool = False
    refine_models: bool = False
    blind_strategy: bool = False

    # GlobalConstants (ALINK_MTP.py:36-43)
    image_res: tuple[int, int] = (224, 224)
    feature_res: int = 2048
    normal_res: tuple[int, int] = (150, 150)

    seed: int = 42
    mesh_shape: tuple[int, ...] = (-1,)
    dtype: str = "bfloat16"
    device_batch: int | str = 1024  # see ALinkConfig.device_batch note
    ingest_dct_scale: bool = False  # see ALinkConfig.ingest_dct_scale
    featurize_scan_units: bool = False  # see ALinkConfig.featurize_scan_units
    loop_checkpoint: str = ""  # see ALinkConfig.loop_checkpoint
    checkpoint_every: int = 1
    train_steps: int = 320000  # see ALinkConfig.train_steps
    debug_nans: bool = False  # see ALinkConfig.debug_nans

    def __post_init__(self):
        if isinstance(self.device_batch, str):
            if self.device_batch != "auto":
                raise ValueError(
                    "device_batch must be a positive int or 'auto'")
        elif self.device_batch <= 0:
            raise ValueError("device_batch must be positive")
        if self.low_res > self.normal_res[0]:  # ALINK_MTP.py:32
            raise ValueError("low_res must be <= normal_res")
        if not (0.0 <= self.split_ratio <= 1.0):
            raise ValueError("split_ratio must be in [0, 1]")
        if not (0.0 <= self.disparity_ratio <= 1.0):
            raise ValueError("disparity_ratio must be in [0, 1]")
        if not (0.0 <= self.eps < 0.5):
            raise ValueError("eps must be in [0, 0.5)")


@dataclasses.dataclass(frozen=True)
class ExistingALConfig:
    """Classical active-learning baseline (reference: code/existing_al.py:29-41)."""

    data_dir_prefix: str = "DFW/DFW_Data/"
    train_images_dir: str = "Training_data"
    model_path: str = "WACV_models/active"
    out_model: str = "WACV_models/post_active"
    query_strategy: str = "uncertainty_sampling"  # | margin_sampling | entropy_sampling

    epochs: int = 3
    batch_size: int = 512
    split_ratio: float = 0.3
    active_ratio: float = 1.0

    image_res: tuple[int, int] = (224, 224)
    feature_res: int = 2048

    seed: int = 42
    mesh_shape: tuple[int, ...] = (-1,)
    dtype: str = "bfloat16"
    ingest_dct_scale: bool = False  # see ALinkConfig.ingest_dct_scale
    featurize_scan_units: bool = False  # see ALinkConfig.featurize_scan_units
