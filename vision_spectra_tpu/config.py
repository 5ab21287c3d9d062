"""Centralized configuration for the TPU-native vision-spectra framework.

Configuration precedence (mirrors the reference framework,
/root/reference/vision_spectra/settings.py:1-341):

1. CLI arguments (highest priority)
2. YAML config files
3. Environment variables (prefixed with ``VISION_SPECTRA_``)
4. Defaults

Differences from the reference are deliberate and TPU-first:

- ``device`` choices are ``auto | cpu | tpu`` (``cuda``/``mps`` are accepted
  and coerced for config-file compatibility but resolve to whatever JAX
  platform is present).
- A ``ParallelConfig`` section describes the device mesh (data / model axes)
  and the mixed-precision policy. On TPU, ``mixed_precision=True`` means
  bfloat16 compute with float32 parameters/optimizer state — there is no loss
  scaler (TPU bf16 keeps the f32 exponent range).
- Seeding is explicit-key based: ``set_seed`` seeds the host-side numpy/python
  RNGs used by data pipelines, and ``root_key`` derives the JAX PRNG key that
  is threaded through every stochastic device computation.
"""

from __future__ import annotations

import os
import random
from enum import Enum
from pathlib import Path
from typing import Any

import numpy as np
import yaml
from pydantic import BaseModel, Field, field_validator

# =============================================================================
# Paths
# =============================================================================


def get_project_root() -> Path:
    """Repository root (directory containing the package)."""
    return Path(__file__).resolve().parents[1]


PROJECT_ROOT = get_project_root()
DATA_DIR = PROJECT_ROOT / "data"
RUNS_DIR = PROJECT_ROOT / "runs"
MLRUNS_DIR = PROJECT_ROOT / "mlruns"
CONFIGS_DIR = PROJECT_ROOT / "configs"


# =============================================================================
# Enums
# =============================================================================


class DatasetName(str, Enum):
    PATHMNIST = "pathmnist"
    PNEUMONIAMNIST = "pneumoniamnist"
    BLOODMNIST = "bloodmnist"
    DERMAMNIST = "dermamnist"
    OCTMNIST = "octmnist"
    ORGANAMNIST = "organamnist"
    SYNTHETIC = "synthetic"


class LossName(str, Enum):
    CROSS_ENTROPY = "cross_entropy"
    FOCAL = "focal"
    LABEL_SMOOTHING = "label_smoothing"
    CLASS_BALANCED = "class_balanced"
    ASYMMETRIC = "asymmetric"


class MIMLossName(str, Enum):
    MSE = "mse"
    L1 = "l1"
    SMOOTH_L1 = "smooth_l1"


class OptimizerName(str, Enum):
    ADAM = "adam"
    ADAMW = "adamw"
    SGD = "sgd"


class SchedulerName(str, Enum):
    COSINE = "cosine"
    STEP = "step"
    PLATEAU = "plateau"
    NONE = "none"


# =============================================================================
# Config models
# =============================================================================


class DatasetConfig(BaseModel):
    """Dataset configuration (reference: settings.py:99-118)."""

    name: DatasetName = Field(default=DatasetName.PATHMNIST)
    image_size: int = Field(default=28, gt=0)
    batch_size: int = Field(default=64, gt=0)
    num_workers: int = Field(default=0, ge=0, description="Host prefetch threads")
    pin_memory: bool = Field(default=True, description="Kept for config compat; no-op on TPU")
    sample_ratio: float = Field(default=1.0, gt=0.0, le=1.0)
    # Train-augmentation semantics: "torchvision" (default) = the
    # reference-faithful two-pass nearest-neighbor warp with shuffled color
    # jitter; "fused" = single bilinear resample (fastest). A 10-seed TPU A/B
    # (results/aug_ab/summary.json) showed torchvision matches the
    # reference's published accuracies within 0.4 pt on every synthetic
    # scenario (fused drifts up to ~1 pt high).
    aug_mode: str = Field(default="torchvision", pattern="^(fused|torchvision)$")

    # Synthetic dataset specific
    num_classes: int = Field(default=5, gt=1)
    num_samples_train: int = Field(default=5000, gt=0)
    num_samples_val: int = Field(default=1000, gt=0)
    num_samples_test: int = Field(default=1000, gt=0)


class ModelConfig(BaseModel):
    """Model configuration (reference: settings.py:121-136).

    ``name`` selects a built-in ViT variant (see models/vit.py VIT_VARIANTS);
    timm-style names like ``vit_tiny_patch16_224`` are understood.
    """

    name: str = Field(default="vit_tiny_patch16_224")
    # The reference pulls pretrained weights from timm's zoo (settings.py:128);
    # this environment has no egress, so the source is a FILE: a torch
    # state_dict (.pth) or .npz in timm's key layout, imported by
    # models/pretrained.py. ``pretrained=True`` requires ``pretrained_path``
    # (or, only when pretrained=True, VISION_SPECTRA_PRETRAINED_PATH);
    # giving pretrained_path alone also loads.
    pretrained: bool = Field(default=False)
    pretrained_path: Path | None = Field(
        default=None, description="timm ViT state_dict file (.pth/.npz)"
    )
    drop_rate: float = Field(default=0.0, ge=0, le=1)
    attn_drop_rate: float = Field(default=0.0, ge=0, le=1)
    drop_path_rate: float = Field(default=0.1, ge=0, le=1)
    # Flash (blockwise Pallas) attention: None = auto — engages whenever the
    # runtime gate is profitable (TPU, N >= 1024 tokens, no active attention
    # dropout; ops/attention.py), which no 28-px geometry reaches but large
    # image/patch combinations do. True forces the gate's use_flash input on,
    # False keeps plain XLA attention everywhere.
    use_flash: bool | None = Field(default=None)

    # Expressivity overrides (None = variant default)
    embed_dim: int | None = Field(default=None, gt=0)
    depth: int | None = Field(default=None, gt=0)
    num_heads: int | None = Field(default=None, gt=0)

    # MIM specific
    mask_ratio: float = Field(default=0.75, gt=0, lt=1)
    decoder_embed_dim: int = Field(default=128, gt=0)
    decoder_depth: int = Field(default=2, gt=0)
    decoder_num_heads: int = Field(default=4, gt=0)


class LossConfig(BaseModel):
    """Loss configuration (reference: settings.py:139-155)."""

    classification: LossName = Field(default=LossName.CROSS_ENTROPY)
    label_smoothing: float = Field(default=0.1, ge=0, le=1)
    focal_gamma: float = Field(default=2.0, ge=0)
    focal_alpha: float | None = Field(default=None)
    class_balanced_beta: float = Field(default=0.9999, ge=0, lt=1)

    mim: MIMLossName = Field(default=MIMLossName.MSE)
    mim_norm_pix: bool = Field(default=True)

    mtl_cls_weight: float = Field(default=1.0, ge=0)
    mtl_mim_weight: float = Field(default=0.5, ge=0)


class OptimizerConfig(BaseModel):
    """Optimizer configuration (reference: settings.py:158-170)."""

    name: OptimizerName = Field(default=OptimizerName.ADAMW)
    learning_rate: float = Field(default=1e-4, gt=0)
    weight_decay: float = Field(default=0.05, ge=0)
    momentum: float = Field(default=0.9, ge=0, le=1)
    betas: tuple[float, float] = Field(default=(0.9, 0.999))

    scheduler: SchedulerName = Field(default=SchedulerName.COSINE)
    warmup_epochs: int = Field(default=5, ge=0)
    min_lr: float = Field(default=1e-6, ge=0)
    # StepLR parameters (reference hardcodes step_size=30, gamma=0.1)
    step_size: int = Field(default=30, gt=0)
    gamma: float = Field(default=0.1, gt=0)
    # Plateau parameters
    plateau_factor: float = Field(default=0.1, gt=0, lt=1)
    plateau_patience: int = Field(default=10, gt=0)


class TrainingConfig(BaseModel):
    """Training configuration (reference: settings.py:173-189)."""

    epochs: int = Field(default=100, gt=0)
    gradient_clip: float = Field(default=1.0, ge=0)
    mixed_precision: bool = Field(default=True, description="bf16 compute on TPU")

    save_every_n_epochs: int = Field(default=10, gt=0)
    keep_top_k: int = Field(default=3, gt=0)

    early_stopping: bool = Field(default=True)
    patience: int = Field(default=15, gt=0)

    smoke_test: bool = Field(default=False)

    # Escape hatch: force the per-step streaming trainers instead of the
    # fused-epoch device program that training commands select by default
    # for device-resident datasets (training/fused.py select_trainer).
    streaming: bool = Field(default=False)


class SpectralConfig(BaseModel):
    """Spectral metrics configuration (reference: settings.py:192-223)."""

    enabled: bool = Field(default=True)
    log_every_n_epochs: int = Field(default=5, gt=0)
    log_every_n_steps: int | None = Field(default=None)
    log_first_epochs: bool = Field(default=True)

    track_distributions: bool = Field(default=False)
    max_singular_values: int = Field(default=50, gt=0)
    save_distribution_history: bool = Field(default=False)

    layers: list[str] = Field(default=["blocks.0", "blocks.5"])

    extract_qkv: bool = Field(default=True)
    extract_mlp: bool = Field(default=False)
    extract_patch_embed: bool = Field(default=True)

    # TPU-native knob: compute SVDs on device (batched, under jit) vs host f64.
    on_device: bool = Field(default=True)

    # Opt-in: log gradient alignment with the rank-reducing direction (U·Vᵀ)
    # at the spectral cadence. The reference ships the instrument but never
    # wires it into a trainer (metrics/gradient_alignment.py); here it is one
    # flag away.
    track_gradient_alignment: bool = Field(default=False)


class ParallelConfig(BaseModel):
    """Device mesh / parallelism configuration (new; TPU-native).

    The reference framework is single-device (settings.py:246-254 picks one of
    cpu/cuda/mps). Here the primary strategy is data parallelism over a 1-D
    mesh; a second `model` axis enables tensor-parallel sharding of QKV / MLP
    weights without API changes.
    """

    data_axis: int = Field(default=-1, description="-1 = all remaining devices")
    model_axis: int = Field(default=1, ge=1)
    # Donate + overlap knobs
    prefetch: int = Field(default=2, ge=0, description="Device prefetch depth")


class ExperimentConfig(BaseModel):
    """Complete experiment configuration (reference: settings.py:226-277)."""

    name: str = Field(default="experiment")
    seed: int = Field(default=42, ge=0)
    device: str = Field(default="auto")

    dataset: DatasetConfig = Field(default_factory=DatasetConfig)
    model: ModelConfig = Field(default_factory=ModelConfig)
    loss: LossConfig = Field(default_factory=LossConfig)
    optimizer: OptimizerConfig = Field(default_factory=OptimizerConfig)
    training: TrainingConfig = Field(default_factory=TrainingConfig)
    spectral: SpectralConfig = Field(default_factory=SpectralConfig)
    parallel: ParallelConfig = Field(default_factory=ParallelConfig)

    output_dir: Path = Field(default=MLRUNS_DIR)
    data_dir: Path = Field(default=DATA_DIR)

    @field_validator("device")
    @classmethod
    def _coerce_device(cls, v: str) -> str:
        allowed = {"auto", "cpu", "tpu", "cuda", "mps"}
        if v not in allowed:
            raise ValueError(f"device must be one of {sorted(allowed)}")
        # cuda/mps accepted for reference-config compatibility; they mean
        # "whatever accelerator JAX finds", i.e. auto.
        return "auto" if v in {"cuda", "mps"} else v

    def get_platform(self) -> str:
        """Resolve the JAX platform name ('tpu' or 'cpu')."""
        import jax

        if self.device == "auto":
            return jax.default_backend()
        return self.device

    @classmethod
    def from_yaml(cls, path: Path | str) -> "ExperimentConfig":
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls.model_validate(data)

    def to_yaml(self, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.dump(self.model_dump(mode="json"), f, default_flow_style=False)

    def to_flat_dict(self) -> dict[str, Any]:
        """Flatten config to dotted keys for experiment-tracking params."""
        return _flatten_dict(self.model_dump(mode="json"))

    def get_run_dir(self) -> Path:
        run_dir = Path(self.output_dir) / self.name
        run_dir.mkdir(parents=True, exist_ok=True)
        return run_dir


def _flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    items: list[tuple[str, Any]] = []
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(_flatten_dict(v, key, sep).items())
        elif isinstance(v, (list, tuple)):
            items.append((key, str(v)))
        else:
            items.append((key, v))
    return dict(items)


# =============================================================================
# Environment overlay (replaces pydantic-settings; reference settings.py:328-341)
# =============================================================================

ENV_PREFIX = "VISION_SPECTRA_"


class EnvSettings:
    """Environment-variable settings with prefix ``VISION_SPECTRA_``.

    Implemented without pydantic-settings (not available in this environment).
    Supported variables: SEED, DEVICE, DATA_DIR, OUTPUT_DIR, MLFLOW_TRACKING_URI.
    """

    def __init__(self) -> None:
        env = os.environ
        self.seed = int(env.get(ENV_PREFIX + "SEED", 42))
        self.device = env.get(ENV_PREFIX + "DEVICE", "auto")
        self.data_dir = Path(env.get(ENV_PREFIX + "DATA_DIR", str(DATA_DIR)))
        self.output_dir = Path(env.get(ENV_PREFIX + "OUTPUT_DIR", str(MLRUNS_DIR)))
        self.mlflow_tracking_uri = Path(
            env.get(ENV_PREFIX + "MLFLOW_TRACKING_URI", str(MLRUNS_DIR))
        )


# =============================================================================
# Reproducibility
# =============================================================================


def set_seed(seed: int, deterministic: bool = True) -> None:
    """Seed host-side RNGs (python / numpy) used by data pipelines.

    Device-side randomness is handled by explicit ``jax.random`` keys derived
    from :func:`root_key` — JAX computations are deterministic given the key,
    so there is no cudnn-style determinism toggle to set.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def root_key(seed: int):
    """The root JAX PRNG key for an experiment."""
    import jax

    return jax.random.key(seed)
