"""MIM pretrain → finetune pipeline validation on TPU (BASELINE config #4).

Pretrains MAE-style on synthetic shapes, then finetunes the encoder for
classification with layer-wise LR, comparing against a from-scratch baseline
at the same budget. Also runs one multitask training (BASELINE config #5
component). Logs to results/mlruns.

Round 2: all four stages run FUSED epochs (one lax.scan device program per
epoch, per-step LR array) - r1 streamed per-step and took 35 min.
"""

import time
from pathlib import Path

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

from vision_spectra_tpu.config import (
    DatasetConfig,
    DatasetName,
    ExperimentConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    SpectralConfig,
    TrainingConfig,
    set_seed,
)
from vision_spectra_tpu.data import get_dataset
from vision_spectra_tpu.losses import get_loss
from vision_spectra_tpu.models import MIMModel, MultitaskViT, build_vit
from vision_spectra_tpu.training import (
    FusedClassificationTrainer,
    FusedFinetuneTrainer,
    FusedMIMTrainer,
    FusedMultitaskTrainer,
)

OUT = Path("/root/repo/results/mlruns")
DATASET = DatasetConfig(
    name=DatasetName.SYNTHETIC,
    batch_size=64,
    num_classes=5,
    num_samples_train=4000,
    num_samples_val=800,
    num_samples_test=800,
)
MODEL = ModelConfig(
    name="vit_tiny_patch4_28",  # patch 4 → 49 patches; meaningful masking
    decoder_embed_dim=128,
    decoder_depth=2,
    mask_ratio=0.75,
)


def cfg_for(name: str, epochs: int, lr: float = 1e-4) -> ExperimentConfig:
    return ExperimentConfig(
        name=name,
        seed=42,
        dataset=DATASET,
        model=MODEL,
        loss=LossConfig(),
        optimizer=OptimizerConfig(learning_rate=lr, warmup_epochs=2),
        training=TrainingConfig(epochs=epochs, early_stopping=False),
        spectral=SpectralConfig(enabled=True, layers=["blocks.0"]),
        output_dir=OUT,
    )


def build_encoder(cfg, info):
    model, _ = build_vit(
        cfg.model.name,
        num_classes=info.num_classes,
        num_channels=info.num_channels,
        image_size=cfg.dataset.image_size,
        drop_path_rate=0.0,
    )
    return model


def main() -> None:
    t0 = time.time()
    set_seed(42)

    # 1. MIM pretraining (20 epochs).
    cfg = cfg_for("pipeline_mim_pretrain", epochs=20)
    ds = get_dataset(cfg.dataset, cfg.data_dir)
    info = ds.get_info()
    enc = build_encoder(cfg, info)
    mim = MIMModel(
        encoder=enc,
        decoder_embed_dim=cfg.model.decoder_embed_dim,
        decoder_depth=cfg.model.decoder_depth,
        decoder_num_heads=cfg.model.decoder_num_heads,
        mask_ratio=cfg.model.mask_ratio,
    )
    pre = FusedMIMTrainer(cfg, mim, ds)
    hist = pre.train()
    print(f"[{time.time()-t0:.0f}s] MIM pretrain: {hist}", flush=True)
    ckpt = pre.temp_dir / "best.msgpack"

    # 2. Finetune from the pretrained encoder (10 epochs, layer-wise LR).
    cfg_ft = cfg_for("pipeline_finetune", epochs=10, lr=1e-3)
    ft = FusedFinetuneTrainer(
        cfg_ft,
        build_encoder(cfg_ft, info),
        ds,
        get_loss(cfg_ft.loss),
        pretrained_checkpoint=ckpt,
        encoder_lr_scale=0.1,
    )
    hist_ft = ft.train()
    print(f"[{time.time()-t0:.0f}s] finetune: {hist_ft}", flush=True)

    # 3. From-scratch baseline at the same finetune budget.
    cfg_sc = cfg_for("pipeline_scratch", epochs=10, lr=1e-3)
    sc = FusedClassificationTrainer(
        cfg_sc, build_encoder(cfg_sc, info), ds, get_loss(cfg_sc.loss)
    )
    hist_sc = sc.train()
    print(f"[{time.time()-t0:.0f}s] scratch: {hist_sc}", flush=True)

    # 4. Multitask training (10 epochs).
    cfg_mtl = cfg_for("pipeline_multitask", epochs=10)
    mtl = MultitaskViT(
        encoder=build_encoder(cfg_mtl, info),
        decoder_embed_dim=cfg_mtl.model.decoder_embed_dim,
        decoder_depth=cfg_mtl.model.decoder_depth,
        mask_ratio=0.5,
    )
    mt = FusedMultitaskTrainer(cfg_mtl, mtl, ds, get_loss(cfg_mtl.loss))
    hist_mtl = mt.train()
    print(f"[{time.time()-t0:.0f}s] multitask: {hist_mtl}", flush=True)

    print(
        "SUMMARY  "
        f"finetune acc={hist_ft.get('val_accuracy'):.4f}  "
        f"scratch acc={hist_sc.get('val_accuracy'):.4f}  "
        f"mtl acc={hist_mtl.get('val_accuracy'):.4f}",
        flush=True,
    )
    for t in (pre, ft, sc, mt):
        t.cleanup()
    print("PIPELINE DONE", round(time.time() - t0), flush=True)


if __name__ == "__main__":
    main()
