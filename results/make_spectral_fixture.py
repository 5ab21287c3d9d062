"""Generate the trained-weights spectral fixture (VERDICT r4 next #7).

Trains the flagship science geometry (192d/6L, scenario-B model) on the
PathMNIST surrogate for a handful of epochs on CPU, extracts the tracked
weight matrices, and commits a float16 subset as
``tests/fixtures/trained_spectra_192d.npz``.

Why trained weights: the device-f32 vs host-float64 SVD drift tests run on
random Gaussian matrices (Marchenko-Pastur bulk, benign); the publication
path runs on TRAINED weights with heavy-tailed spectra and tiny tail
singular values — exactly where f32 could plausibly bend the alpha fits.
The committed fixture pins that case in CI (tests/test_spectral.py
TestTrainedWeightDrift).

float16 storage: both paths consume the SAME f16-rounded matrix, so the
device-vs-host comparison stays apples-to-apples while the fixture stays
~2 MB. Rerun: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu \
    python results/make_spectral_fixture.py
"""

import os
import tempfile
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

EPOCHS = 8
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main() -> None:
    from vision_spectra_tpu.config import (
        DatasetConfig,
        DatasetName,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        SpectralConfig,
        TrainingConfig,
    )
    from vision_spectra_tpu.data import get_dataset
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.spectral.extraction import extract_all_weights
    from vision_spectra_tpu.training import FusedClassificationTrainer

    tmp = Path(tempfile.mkdtemp(prefix="vst_fixture_"))
    cfg = ExperimentConfig(
        name="spectral_fixture",
        seed=42,
        dataset=DatasetConfig(
            name=DatasetName.PATHMNIST, batch_size=64, sample_ratio=0.05
        ),
        model=ModelConfig(name="vit_tiny_patch16_224", embed_dim=192, depth=6,
                          drop_path_rate=0.0),
        training=TrainingConfig(epochs=EPOCHS, smoke_test=False,
                                early_stopping=False),
        optimizer=OptimizerConfig(warmup_epochs=1, learning_rate=1e-3),
        spectral=SpectralConfig(enabled=False),
        output_dir=tmp / "mlruns",
        data_dir=tmp / "data",
    )
    ds = get_dataset(cfg.dataset, cfg.data_dir)
    info = ds.get_info()
    model, _ = build_vit(
        cfg.model.name, num_classes=info.num_classes,
        num_channels=info.num_channels, image_size=info.image_size[0],
        embed_dim=cfg.model.embed_dim, depth=cfg.model.depth,
        drop_path_rate=0.0,
    )
    trainer = FusedClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
    hist = trainer.train()
    print(f"trained {EPOCHS} epochs: loss={float(hist['loss']):.4f} "
          f"val_acc={hist['val_accuracy']:.3f}")

    weights = extract_all_weights(trainer.state.params, include_mlp=True)
    OUT.mkdir(parents=True, exist_ok=True)
    arrays = {}
    for w in weights:
        # Subset: layers 0/3/5 q,k,v,proj + layer 0 mlp_up + patch_embed —
        # heavy-tailed 192x192 and 192x768 trained matrices, ~2 MB in f16.
        keep = (
            (w.layer_idx in (0, 3, 5)
             and w.matrix_type in ("q", "k", "v", "attn_proj"))
            or (w.layer_idx == 0 and w.matrix_type == "mlp_up")
            or w.matrix_type == "patch_embed"
        )
        if keep:
            arrays[w.name] = np.asarray(w.weight, np.float16)
    path = OUT / "trained_spectra_192d.npz"
    np.savez_compressed(path, **arrays)
    size = path.stat().st_size / 1e6
    print(f"wrote {path} ({size:.2f} MB): {sorted(arrays)}")
    trainer.cleanup()


if __name__ == "__main__":
    main()
