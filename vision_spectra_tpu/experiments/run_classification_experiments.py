"""Classification loss × seed sweep driver.

Reference behavior: vision_spectra/experiments/run_classification_experiments.py:
99-742 — runs every configured loss with every seed through the full
ClassificationTrainer pipeline, isolates per-run crashes into failed result
rows (sweeps continue), saves a results JSON, and prints a Rich summary
grouped by loss with mean ± std AUROC / accuracy / F1.
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

DEFAULT_LOSSES = [
    LossName.CROSS_ENTROPY,
    LossName.FOCAL,
    LossName.LABEL_SMOOTHING,
    LossName.CLASS_BALANCED,
    LossName.ASYMMETRIC,
]
DEFAULT_SEEDS = [42, 123, 456, 789, 1024]


@dataclass
class SweepConfig:
    dataset: str = "pathmnist"
    model: str = "vit_tiny_patch16_224"
    losses: list[LossName] = field(default_factory=lambda: list(DEFAULT_LOSSES))
    seeds: list[int] = field(default_factory=lambda: list(DEFAULT_SEEDS))
    epochs: int = 50
    patience: int = 10
    batch_size: int = 64
    learning_rate: float = 1e-4
    sample_ratio: float = 1.0
    device: str = "auto"
    fast_mode: bool = False  # disables spectral logging
    log_every_n_epochs: int = 5
    log_first_epochs: bool = True
    track_distributions: bool = True
    save_distribution_history: bool = True
    smoke_test: bool = False
    output_dir: Path = MLRUNS_DIR
    data_dir: Path = DATA_DIR


@dataclass
class ExperimentResult:
    loss_name: str
    seed: int
    success: bool
    final_metrics: dict[str, float] = field(default_factory=dict)
    training_time: float = 0.0
    error_message: str | None = None


def _experiment_config(sweep: SweepConfig, loss: LossName, seed: int) -> ExperimentConfig:
    """Full per-run config (reference :220-258)."""
    return ExperimentConfig(
        name=f"cls_{sweep.dataset}_{loss.value}",
        seed=seed,
        dataset=DatasetConfig(
            name=DatasetName(sweep.dataset),
            batch_size=sweep.batch_size,
            sample_ratio=sweep.sample_ratio,
        ),
        device=sweep.device,
        model=ModelConfig(name=sweep.model),
        loss=LossConfig(classification=loss),
        optimizer=OptimizerConfig(learning_rate=sweep.learning_rate),
        training=TrainingConfig(
            epochs=sweep.epochs,
            smoke_test=sweep.smoke_test,
            patience=sweep.patience,
        ),
        spectral=SpectralConfig(
            enabled=not sweep.fast_mode,
            log_every_n_epochs=sweep.log_every_n_epochs,
            log_first_epochs=sweep.log_first_epochs,
            track_distributions=sweep.track_distributions,
            save_distribution_history=sweep.save_distribution_history,
        ),
        output_dir=sweep.output_dir,
        data_dir=sweep.data_dir,
    )


def run_single_experiment(
    sweep: SweepConfig, loss: LossName, seed: int
) -> ExperimentResult:
    """One loss × seed run with crash isolation (reference :181-386)."""
    from vision_spectra_tpu.data import get_dataset
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training import FusedClassificationTrainer

    start = time.time()
    trainer = None
    try:
        set_seed(seed)
        cfg = _experiment_config(sweep, loss, seed)
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
        return ExperimentResult(
            loss_name=loss.value,
            seed=seed,
            success=True,
            final_metrics={k: float(v) for k, v in final.items()},
            training_time=time.time() - start,
        )
    except Exception as e:
        logger.error("Run %s seed %d failed: %s", loss.value, seed, e)
        import traceback

        traceback.print_exc()
        return ExperimentResult(
            loss_name=loss.value,
            seed=seed,
            success=False,
            training_time=time.time() - start,
            error_message=str(e),
        )
    finally:
        if trainer is not None:
            trainer.cleanup()


def run_all_experiments(sweep: SweepConfig) -> list[ExperimentResult]:
    from vision_spectra_tpu.core.runtime import apply_platform

    apply_platform(sweep.device)
    results = []
    total = len(sweep.losses) * len(sweep.seeds)
    i = 0
    for loss in sweep.losses:
        for seed in sweep.seeds:
            i += 1
            logger.info("[%d/%d] loss=%s seed=%d", i, total, loss.value, seed)
            results.append(run_single_experiment(sweep, loss, seed))
    return results


def save_results(results: list[ExperimentResult], sweep: SweepConfig) -> Path:
    """``results_{dataset}_{timestamp}.json`` (reference :447-475)."""
    out_dir = Path(sweep.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    path = out_dir / f"results_{sweep.dataset}_{ts}.json"
    payload = {
        "dataset": sweep.dataset,
        "model": sweep.model,
        "epochs": sweep.epochs,
        "timestamp": ts,
        "results": [asdict(r) for r in results],
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    logger.info("Results saved to %s", path)
    return path


def print_summary(results: list[ExperimentResult]) -> None:
    """Rich summary grouped by loss (reference :478-534)."""
    from rich.console import Console
    from rich.table import Table

    table = Table(title="Classification Sweep Summary")
    for col in ("Loss", "Runs", "AUROC", "Accuracy", "F1 (macro)"):
        table.add_column(col)
    by_loss: dict[str, list[ExperimentResult]] = {}
    for r in results:
        by_loss.setdefault(r.loss_name, []).append(r)
    for loss_name, rs in by_loss.items():
        ok = [r for r in rs if r.success]

        def stat(key: str) -> str:
            vals = [r.final_metrics.get(key, np.nan) for r in ok]
            vals = [v for v in vals if np.isfinite(v)]
            if not vals:
                return "-"
            return f"{np.mean(vals):.4f} ± {np.std(vals):.4f}"

        table.add_row(
            loss_name,
            f"{len(ok)}/{len(rs)}",
            stat("auroc"),
            stat("accuracy"),
            stat("f1_macro"),
        )
    Console().print(table)
    failed = [r for r in results if not r.success]
    if failed:
        Console().print(f"[red]{len(failed)} failed runs[/red]")
        for r in failed:
            Console().print(f"  {r.loss_name} seed {r.seed}: {r.error_message}")


@click.group("classification")
def classification() -> None:
    """Classification loss × seed sweeps."""


@classification.command("run")
@click.option("--dataset", "-d", default="pathmnist")
@click.option("--model", "-m", default="vit_tiny_patch16_224")
@click.option("--losses", "-l", multiple=True, help="Subset of losses (default: all 5)")
@click.option("--seeds", "-s", multiple=True, type=int, help="Seeds (default: 42,123,456,789,1024)")
@click.option("--num-seeds", default=None, type=int, help="Derive seeds as 42+100i")
@click.option("--epochs", "-e", default=50)
@click.option("--patience", "-p", default=10, help="Early-stopping patience")
@click.option("--batch-size", "-b", default=64)
@click.option("--lr", default=1e-4)
@click.option("--sample-ratio", "-r", default=1.0)
@click.option("--device", default="auto", help="Device (auto/cpu/tpu)")
@click.option("--fast-mode", "--fast", "-f", is_flag=True, default=False, help="Disable spectral logging")
@click.option("--log-every-n-epochs", default=5, help="Spectral logging cadence")
@click.option("--log-first-epochs/--no-log-first-epochs", default=True,
              help="Log spectral metrics for the first 5 epochs")
@click.option("--track-distributions/--no-track-distributions", default=True,
              help="Track full singular-value distributions as JSON arrays")
@click.option("--save-distribution-history/--no-save-distribution-history",
              default=True, help="Save spectral history JSON + histogram plots")
@click.option("--smoke-test", is_flag=True, default=False)
@click.option("--output-dir", "--output", "-o", type=click.Path(path_type=Path), default=MLRUNS_DIR)
@click.option("--data-dir", type=click.Path(path_type=Path), default=DATA_DIR)
def run(dataset, model, losses, seeds, num_seeds, epochs, patience, batch_size,
        lr, sample_ratio, device, fast_mode, log_every_n_epochs,
        log_first_epochs, track_distributions, save_distribution_history,
        smoke_test, output_dir, data_dir):
    """Run the loss × seed sweep (reference :537-715)."""
    sweep = SweepConfig(
        dataset=dataset,
        model=model,
        losses=[LossName(x) for x in losses] if losses else list(DEFAULT_LOSSES),
        seeds=(
            [42 + 100 * i for i in range(num_seeds)]
            if num_seeds is not None
            else ([int(s) for s in seeds] if seeds else list(DEFAULT_SEEDS))
        ),
        epochs=epochs,
        patience=patience,
        batch_size=batch_size,
        learning_rate=lr,
        sample_ratio=sample_ratio,
        device=device,
        fast_mode=fast_mode,
        log_every_n_epochs=log_every_n_epochs,
        log_first_epochs=log_first_epochs,
        track_distributions=track_distributions,
        save_distribution_history=save_distribution_history,
        smoke_test=smoke_test,
        output_dir=Path(output_dir),
        data_dir=Path(data_dir),
    )
    results = run_all_experiments(sweep)
    save_results(results, sweep)
    print_summary(results)


@classification.command("list-losses")
def list_losses():
    """List registered classification losses (reference :718)."""
    from vision_spectra_tpu.losses import LOSS_REGISTRY

    for name in LOSS_REGISTRY:
        click.echo(name)
