"""Synthetic-shapes complexity sweep.

Reference behavior: vision_spectra/experiments/run_synthetic_experiments.py:
113-869 — the full ClassificationTrainer pipeline (unlike the minimal
six-scenario loop) over the synthetic dataset, defaults 3 losses
(CE / focal / label-smoothing) × 3 seeds × 30 epochs, plus a
``compare-complexity`` sweep over TRIVIAL(2cls/500) / SIMPLE(3/1000) /
MEDIUM(5/5000) with CE only, and a ``list-shapes`` doc command.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from datetime import datetime
from pathlib import Path

import click
import numpy as np

from vision_spectra_tpu.config import (
    DATA_DIR,
    DatasetConfig,
    DatasetName,
    ExperimentConfig,
    LossConfig,
    LossName,
    MLRUNS_DIR,
    ModelConfig,
    OptimizerConfig,
    SpectralConfig,
    TrainingConfig,
    set_seed,
)
from vision_spectra_tpu.utils.logging import logger

DEFAULT_LOSSES = [LossName.CROSS_ENTROPY, LossName.FOCAL, LossName.LABEL_SMOOTHING]
DEFAULT_SEEDS = [42, 123, 456]

COMPLEXITY_LEVELS = {
    "trivial": {"num_classes": 2, "num_samples": 500},
    "simple": {"num_classes": 3, "num_samples": 1000},
    "medium": {"num_classes": 5, "num_samples": 5000},
}


@dataclass
class SyntheticExperimentConfig:
    num_classes: int = 3
    num_samples: int = 1000
    losses: list[LossName] = field(default_factory=lambda: list(DEFAULT_LOSSES))
    seeds: list[int] = field(default_factory=lambda: list(DEFAULT_SEEDS))
    epochs: int = 30
    batch_size: int = 32
    learning_rate: float = 1e-4
    model: str = "vit_tiny_patch16_224"
    spectral_every_n: int = 2
    smoke_test: bool = False
    output_dir: Path = MLRUNS_DIR
    data_dir: Path = DATA_DIR


@dataclass
class SyntheticResult:
    loss_name: str
    seed: int
    success: bool
    final_metrics: dict[str, float] = field(default_factory=dict)
    convergence_epoch: int | None = None
    training_time: float = 0.0
    error_message: str | None = None


def run_single_synthetic_experiment(
    sx: SyntheticExperimentConfig, loss: LossName, seed: int
) -> SyntheticResult:
    """Full-pipeline run on synthetic data (reference :195-368)."""
    from vision_spectra_tpu.data import get_dataset
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training import FusedClassificationTrainer

    start = time.time()
    trainer = None
    try:
        set_seed(seed)
        cfg = ExperimentConfig(
            name=f"synthetic_{sx.num_classes}cls_{loss.value}",
            seed=seed,
            dataset=DatasetConfig(
                name=DatasetName.SYNTHETIC,
                batch_size=sx.batch_size,
                num_classes=sx.num_classes,
                num_samples_train=sx.num_samples,
                num_samples_val=max(1, sx.num_samples // 5),
                num_samples_test=max(1, sx.num_samples // 5),
            ),
            model=ModelConfig(name=sx.model),
            loss=LossConfig(classification=loss),
            optimizer=OptimizerConfig(learning_rate=sx.learning_rate),
            training=TrainingConfig(epochs=sx.epochs, smoke_test=sx.smoke_test),
            spectral=SpectralConfig(
                enabled=True,
                log_every_n_epochs=sx.spectral_every_n,
                log_first_epochs=False,
            ),
            output_dir=sx.output_dir,
            data_dir=sx.data_dir,
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()
        model, _ = build_vit(
            cfg.model.name,
            num_classes=info.num_classes,
            num_channels=info.num_channels,
            image_size=cfg.dataset.image_size,
        )
        counts = (
            info.class_counts["train"] if loss == LossName.CLASS_BALANCED else None
        )
        loss_fn = get_loss(cfg.loss, samples_per_class=counts)
        # Fused epochs (one lax.scan program per epoch); smoke mode
        # automatically falls back to the streaming path.
        trainer = FusedClassificationTrainer(
            cfg, model, ds, loss_fn, run_name=f"seed_{seed}"
        )
        trainer.train()
        final = trainer.validate()
        # Convergence epoch: last − patience when early-stopped (reference :316-320).
        conv = trainer.current_epoch
        if conv < sx.epochs:
            conv = max(1, conv - cfg.training.patience)
        return SyntheticResult(
            loss_name=loss.value,
            seed=seed,
            success=True,
            final_metrics={k: float(v) for k, v in final.items()},
            convergence_epoch=conv,
            training_time=time.time() - start,
        )
    except Exception as e:
        logger.error("Synthetic run %s seed %d failed: %s", loss.value, seed, e)
        return SyntheticResult(
            loss_name=loss.value,
            seed=seed,
            success=False,
            training_time=time.time() - start,
            error_message=str(e),
        )
    finally:
        if trainer is not None:
            trainer.cleanup()


def _print_summary(results: list[SyntheticResult], title: str) -> None:
    from rich.console import Console
    from rich.table import Table

    table = Table(title=title)
    for col in ("Loss", "Runs", "Accuracy", "F1", "Convergence epoch"):
        table.add_column(col)
    by_loss: dict[str, list[SyntheticResult]] = {}
    for r in results:
        by_loss.setdefault(r.loss_name, []).append(r)
    for loss_name, rs in by_loss.items():
        ok = [r for r in rs if r.success]

        def stat(key):
            vals = [r.final_metrics.get(key, np.nan) for r in ok]
            vals = [v for v in vals if np.isfinite(v)]
            return f"{np.mean(vals):.4f} ± {np.std(vals):.4f}" if vals else "-"

        convs = [r.convergence_epoch for r in ok if r.convergence_epoch]
        table.add_row(
            loss_name,
            f"{len(ok)}/{len(rs)}",
            stat("accuracy"),
            stat("f1_macro"),
            f"{np.mean(convs):.1f}" if convs else "-",
        )
    Console().print(table)


@click.group("synthetic")
def synthetic() -> None:
    """Synthetic-shapes complexity experiments."""


@synthetic.command("run")
@click.option("--num-classes", default=3)
@click.option("--num-samples", default=1000)
@click.option("--losses", "-l", multiple=True)
@click.option("--seeds", "-s", multiple=True, type=int)
@click.option("--epochs", "-e", default=30)
@click.option("--batch-size", "-b", default=32)
@click.option("--lr", default=1e-4)
@click.option("--smoke-test", is_flag=True, default=False)
@click.option("--output-dir", type=click.Path(path_type=Path), default=MLRUNS_DIR)
@click.option("--data-dir", type=click.Path(path_type=Path), default=DATA_DIR)
def run(num_classes, num_samples, losses, seeds, epochs, batch_size, lr,
        smoke_test, output_dir, data_dir):
    """Run the synthetic sweep (reference :578-733)."""
    sx = SyntheticExperimentConfig(
        num_classes=num_classes,
        num_samples=num_samples,
        losses=[LossName(x) for x in losses] if losses else list(DEFAULT_LOSSES),
        seeds=[int(s) for s in seeds] if seeds else list(DEFAULT_SEEDS),
        epochs=epochs,
        batch_size=batch_size,
        learning_rate=lr,
        smoke_test=smoke_test,
        output_dir=Path(output_dir),
        data_dir=Path(data_dir),
    )
    results = []
    for loss in sx.losses:
        for seed in sx.seeds:
            logger.info("synthetic run loss=%s seed=%d", loss.value, seed)
            results.append(run_single_synthetic_experiment(sx, loss, seed))
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = Path(output_dir) / f"results_synthetic_{ts}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump([asdict(r) for r in results], f, indent=2, default=str)
    _print_summary(results, f"Synthetic sweep ({num_classes} classes, {num_samples} samples)")


@synthetic.command("compare-complexity")
@click.option("--epochs", "-e", default=30)
@click.option("--seeds", "-s", multiple=True, type=int)
@click.option("--smoke-test", is_flag=True, default=False)
@click.option("--output-dir", type=click.Path(path_type=Path), default=MLRUNS_DIR)
@click.option("--data-dir", type=click.Path(path_type=Path), default=DATA_DIR)
def compare_complexity(epochs, seeds, smoke_test, output_dir, data_dir):
    """TRIVIAL / SIMPLE / MEDIUM complexity comparison, CE only (reference :765-798)."""
    all_results = {}
    for level, spec in COMPLEXITY_LEVELS.items():
        sx = SyntheticExperimentConfig(
            num_classes=spec["num_classes"],
            num_samples=spec["num_samples"],
            losses=[LossName.CROSS_ENTROPY],
            seeds=[int(s) for s in seeds] if seeds else list(DEFAULT_SEEDS),
            epochs=epochs,
            smoke_test=smoke_test,
            output_dir=Path(output_dir),
            data_dir=Path(data_dir),
        )
        results = [
            run_single_synthetic_experiment(sx, LossName.CROSS_ENTROPY, seed)
            for seed in sx.seeds
        ]
        all_results[level] = results
        _print_summary(results, f"Complexity: {level}")
    for level, results in all_results.items():
        ok = [r for r in results if r.success]
        accs = [r.final_metrics.get("accuracy", np.nan) for r in ok]
        click.echo(f"{level}: acc = {np.mean(accs):.4f}" if accs else f"{level}: failed")


@synthetic.command("list-shapes")
def list_shapes():
    """Describe the shape classes (reference :839-869)."""
    from vision_spectra_tpu.data.synthetic import SHAPES

    descriptions = {
        "circle": "filled ellipse at random position/size",
        "square": "filled axis-aligned rectangle",
        "triangle": "filled isoceles triangle (apex up)",
        "star": "five-pointed star (outer/inner radius 2:1)",
        "cross": "plus sign (bar width = size/3)",
    }
    for i, shape in enumerate(SHAPES):
        click.echo(f"{i}: {shape:10s} — {descriptions[shape]}")
