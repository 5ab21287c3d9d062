"""Prefetch loader tests."""

import numpy as np

from vision_spectra_tpu.data.base import ArraySplit, Loader
from vision_spectra_tpu.data.prefetch import PrefetchLoader


def _split(n=40):
    return ArraySplit(
        np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1)
        * np.ones((n, 4, 4, 3), np.uint8),
        np.arange(n),
    )


def test_prefetch_yields_same_batches():
    loader = Loader(_split(), batch_size=8, shuffle=False)
    direct = [b.labels.copy() for b in loader]
    pre = PrefetchLoader(Loader(_split(), batch_size=8), prefetch=2, to_device=False)
    fetched = [np.asarray(b.labels) for b in pre]
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetch_to_device():
    import jax

    pre = PrefetchLoader(Loader(_split(16), batch_size=8), to_device=True)
    batches = list(pre)
    assert len(batches) == 2
    assert isinstance(batches[0].images, jax.Array)


def test_len_and_num_samples():
    pre = PrefetchLoader(Loader(_split(20), batch_size=8))
    assert len(pre) == 3
    assert pre.num_samples == 20


def test_trainer_with_prefetch_workers(tmp_path):
    """num_workers > 0 routes training through the PrefetchLoader."""
    from vision_spectra_tpu.config import (
        DatasetConfig, DatasetName, ExperimentConfig, ModelConfig,
        OptimizerConfig, SpectralConfig, TrainingConfig,
    )
    from vision_spectra_tpu.data import get_dataset
    from vision_spectra_tpu.losses import get_loss
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training import ClassificationTrainer

    cfg = ExperimentConfig(
        name="prefetch_train",
        dataset=DatasetConfig(
            name=DatasetName.SYNTHETIC, batch_size=8, num_classes=3,
            num_samples_train=32, num_samples_val=16, num_samples_test=16,
            num_workers=2,
        ),
        model=ModelConfig(name="vit_tiny_patch4_28", embed_dim=32, depth=1,
                          drop_path_rate=0.0),
        training=TrainingConfig(epochs=1, smoke_test=True),
        optimizer=OptimizerConfig(warmup_epochs=1),
        spectral=SpectralConfig(enabled=False),
        output_dir=tmp_path / "runs",
        data_dir=tmp_path / "data",
    )
    ds = get_dataset(cfg.dataset, cfg.data_dir)
    info = ds.get_info()
    model, _ = build_vit(cfg.model.name, num_classes=info.num_classes,
                         image_size=28, embed_dim=32, depth=1, drop_path_rate=0.0)
    trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
    assert isinstance(trainer.train_loader, PrefetchLoader)
    hist = trainer.train()
    assert hist["loss"] > 0
    trainer.cleanup()


def test_abandoned_iterator_releases_thread():
    """Partial iteration (next(iter(loader))) must not leak a blocked
    producer thread."""
    import gc
    import threading
    import time

    import numpy as np

    from vision_spectra_tpu.data.base import ArraySplit, Loader
    from vision_spectra_tpu.data.prefetch import PrefetchLoader

    split = ArraySplit(
        np.zeros((64, 8, 8, 3), np.uint8), np.zeros(64, np.int32)
    )
    loader = PrefetchLoader(Loader(split, batch_size=4), prefetch=1,
                            to_device=False)
    before = threading.active_count()
    for _ in range(5):
        it = iter(loader)
        next(it)
        del it
        gc.collect()
    time.sleep(0.5)  # give released threads time to exit
    assert threading.active_count() <= before + 1
