"""``vision-spectra experiments`` sub-app aggregating the sweep drivers."""

from __future__ import annotations

import click

from vision_spectra_tpu.experiments.run_classification_experiments import classification
from vision_spectra_tpu.experiments.run_spectral_analysis import spectral_analysis
from vision_spectra_tpu.experiments.run_synthetic_experiments import synthetic


@click.group("experiments")
def experiments() -> None:
    """Experiment sweep drivers (classification / spectral-analysis / synthetic)."""


experiments.add_command(classification)
experiments.add_command(spectral_analysis)
experiments.add_command(synthetic)
