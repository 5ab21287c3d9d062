"""Training tests: model shapes, smoke trainings, checkpoints, determinism.

Mirrors reference tests/test_training.py plus schedule/metric unit tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_spectra_tpu.config import (
    DatasetConfig,
    DatasetName,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    SchedulerName,
    SpectralConfig,
    TrainingConfig,
)
from vision_spectra_tpu.data import get_dataset
from vision_spectra_tpu.losses import get_loss
from vision_spectra_tpu.models import MIMModel, MultitaskViT, build_vit


def _tiny_config(tmp_path, name="test_exp", **overrides):
    cfg = ExperimentConfig(
        name=name,
        seed=42,
        dataset=DatasetConfig(
            name=DatasetName.SYNTHETIC,
            batch_size=8,
            num_classes=3,
            num_samples_train=32,
            num_samples_val=16,
            num_samples_test=16,
        ),
        model=ModelConfig(
            name="vit_tiny_patch4_28", embed_dim=32, depth=1,
            decoder_embed_dim=32, decoder_depth=1, drop_path_rate=0.0,
        ),
        training=TrainingConfig(epochs=1, smoke_test=True),
        optimizer=OptimizerConfig(warmup_epochs=1),
        spectral=SpectralConfig(enabled=False),
        output_dir=tmp_path / "mlruns",
        data_dir=tmp_path / "data",
    )
    return cfg.model_copy(update=overrides)


def _build_encoder(cfg, info):
    model, _ = build_vit(
        cfg.model.name,
        num_classes=info.num_classes,
        num_channels=info.num_channels,
        image_size=info.image_size[0],
        embed_dim=cfg.model.embed_dim,
        depth=cfg.model.depth,
        drop_path_rate=cfg.model.drop_path_rate,
    )
    return model


class TestModelShapes:
    def test_vit_forward(self):
        import jax
        import jax.numpy as jnp

        model, _ = build_vit("vit_tiny_patch16_224", num_classes=5, image_size=32,
                             embed_dim=32, depth=1)
        x = jnp.zeros((4, 32, 32, 3))
        v = model.init(jax.random.key(0), x)
        out = model.apply(v, x)
        assert out.shape == (4, 5)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_mim_forward(self):
        import jax
        import jax.numpy as jnp

        enc, _ = build_vit("vit_tiny_patch4_28", num_classes=3, image_size=28,
                           embed_dim=32, depth=1, drop_path_rate=0.0)
        mim = MIMModel(encoder=enc, decoder_embed_dim=32, decoder_depth=1)
        x = jnp.asarray(np.random.RandomState(0).rand(4, 28, 28, 3), jnp.float32)
        v = mim.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
        loss, pred, mask = mim.apply(v, x, rngs={"mask": jax.random.key(2)})
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert mask.shape[0] == 4
        assert pred.shape == (4, 49, 48)

    def test_multitask_modes(self):
        import jax
        import jax.numpy as jnp

        enc, _ = build_vit("vit_tiny_patch4_28", num_classes=3, image_size=28,
                           embed_dim=32, depth=1, drop_path_rate=0.0)
        mtl = MultitaskViT(encoder=enc, decoder_embed_dim=32, decoder_depth=1)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 3), jnp.float32)
        v = mtl.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
        logits = mtl.apply(v, x, mode="classification")
        assert logits.shape == (2, 3)
        loss, pred, mask = mtl.apply(v, x, mode="mim", rngs={"mask": jax.random.key(2)})
        assert np.isfinite(float(loss))
        logits, mloss, pred, mask = mtl.apply(
            v, x, mode="multitask", rngs={"mask": jax.random.key(3)}
        )
        assert logits.shape == (2, 3) and np.isfinite(float(mloss))

    def test_seed_determinism(self):
        """Same seed → identical init weights (reference :354-371)."""
        import jax
        import jax.numpy as jnp

        x = jnp.zeros((1, 28, 28, 3))
        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, embed_dim=32, depth=1)
        v1 = model.init(jax.random.key(7), x)
        v2 = model.init(jax.random.key(7), x)
        for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSmokeTrainings:
    def test_classification(self, tmp_path):
        from vision_spectra_tpu.training import ClassificationTrainer

        cfg = _tiny_config(tmp_path)
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        hist = trainer.train()
        for key in ("loss", "accuracy", "val_loss", "val_accuracy", "val_f1_macro"):
            assert key in hist
        assert hist["loss"] > 0
        trainer.cleanup()

    def test_mim(self, tmp_path):
        from vision_spectra_tpu.training import MIMTrainer

        cfg = _tiny_config(tmp_path, name="test_mim")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        enc = _build_encoder(cfg, ds.get_info())
        mim = MIMModel(encoder=enc, decoder_embed_dim=32, decoder_depth=1)
        trainer = MIMTrainer(cfg, mim, ds)
        hist = trainer.train()
        assert hist["loss"] > 0 and "val_loss" in hist
        trainer.cleanup()

    def test_multitask(self, tmp_path):
        from vision_spectra_tpu.training import MultitaskTrainer

        cfg = _tiny_config(tmp_path, name="test_mtl")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        enc = _build_encoder(cfg, ds.get_info())
        mtl = MultitaskViT(encoder=enc, decoder_embed_dim=32, decoder_depth=1)
        trainer = MultitaskTrainer(cfg, mtl, ds, get_loss(cfg.loss))
        hist = trainer.train()
        for key in ("loss", "cls_loss", "mim_loss", "accuracy"):
            assert key in hist
        trainer.cleanup()

    def test_spectral_logging_in_training(self, tmp_path):
        from vision_spectra_tpu import tracking
        from vision_spectra_tpu.training import ClassificationTrainer

        cfg = _tiny_config(
            tmp_path,
            name="test_spectral",
            spectral=SpectralConfig(enabled=True, layers=["blocks.0"]),
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        trainer.train()
        tracking.set_tracking_uri(cfg.output_dir)
        df = tracking.search_runs(experiment_names=["test_spectral"])
        run_id = df.iloc[0]["run_id"]
        hist = tracking.MlflowClient().get_metric_history(
            run_id, "spectral/alpha_exponent_mean"
        )
        # epoch-0 pre-training snapshot + epoch-1 snapshot
        assert [m.step for m in hist] == [0, 1]
        trainer.cleanup()


class TestCheckpointRoundtrip:
    def test_save_load_reproduces_outputs(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from vision_spectra_tpu.training import ClassificationTrainer
        from vision_spectra_tpu.utils.checkpointing import load_checkpoint, save_checkpoint

        cfg = _tiny_config(tmp_path, name="test_ckpt")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        trainer.train()

        x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 3), jnp.float32)
        before = np.asarray(model.apply({"params": trainer.state.params}, x))

        path = tmp_path / "ckpt.msgpack"
        save_checkpoint(path, trainer.state, epoch=1, config=cfg)
        ckpt = load_checkpoint(path, state_template=trainer.state)
        after = np.asarray(model.apply({"params": ckpt["state"].params}, x))
        np.testing.assert_allclose(before, after, atol=1e-6)
        assert ckpt["config"]["model"]["name"] == "vit_tiny_patch4_28"
        trainer.cleanup()

    def test_finetune_loads_encoder(self, tmp_path):
        from vision_spectra_tpu.training import FinetuneTrainer, MIMTrainer

        cfg = _tiny_config(tmp_path, name="test_pretrain")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        enc = _build_encoder(cfg, ds.get_info())
        mim = MIMModel(encoder=enc, decoder_embed_dim=32, decoder_depth=1)
        pre = MIMTrainer(cfg, mim, ds)
        pre.train()
        ckpt_path = pre.temp_dir / "best.msgpack"
        assert ckpt_path.exists()

        cfg2 = _tiny_config(tmp_path, name="test_ft")
        model2 = _build_encoder(cfg2, ds.get_info())
        ft = FinetuneTrainer(
            cfg2, model2, ds, get_loss(cfg2.loss),
            pretrained_checkpoint=ckpt_path, encoder_lr_scale=0.1,
        )
        # patch_embed kernel must equal the pretrained encoder's
        pretrained_pe = np.asarray(pre.state.params["encoder"]["patch_embed"]["kernel"])
        loaded_pe = np.asarray(ft.state.params["patch_embed"]["kernel"])
        np.testing.assert_array_equal(pretrained_pe, loaded_pe)
        pre.cleanup()
        ft.cleanup()

    def test_freeze_encoder_trains_head_only(self, tmp_path):
        from vision_spectra_tpu.training import FinetuneTrainer

        cfg = _tiny_config(tmp_path, name="test_freeze")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        ft = FinetuneTrainer(cfg, model, ds, get_loss(cfg.loss), freeze_encoder=True)
        before_pe = np.asarray(ft.state.params["patch_embed"]["kernel"]).copy()
        before_head = np.asarray(ft.state.params["head"]["kernel"]).copy()
        ft.train()
        after_pe = np.asarray(ft.state.params["patch_embed"]["kernel"])
        after_head = np.asarray(ft.state.params["head"]["kernel"])
        np.testing.assert_array_equal(before_pe, after_pe)  # frozen
        assert not np.array_equal(before_head, after_head)  # trained
        ft.cleanup()


class TestSchedules:
    def _cfg(self, **kw):
        defaults = dict(learning_rate=1e-3, warmup_epochs=2, min_lr=1e-6)
        defaults.update(kw)
        return OptimizerConfig(**defaults)

    def test_linear_warmup(self):
        from vision_spectra_tpu.training import LRSchedule

        s = LRSchedule(self._cfg(), epochs=10, steps_per_epoch=10)
        assert s.lr_for_step(0) == pytest.approx(1e-3 * 1 / 20)
        assert s.lr_for_step(19) == pytest.approx(1e-3)
        assert s.lr_for_step(20) == pytest.approx(1e-3)

    def test_cosine_decays_to_min(self):
        from vision_spectra_tpu.training import LRSchedule

        s = LRSchedule(self._cfg(scheduler=SchedulerName.COSINE), epochs=10, steps_per_epoch=10)
        for e in range(10):
            s.step_epoch(e)
        assert s.current_lr == pytest.approx(1e-6, abs=1e-9)

    def test_step_scheduler(self):
        from vision_spectra_tpu.training import LRSchedule

        cfg = self._cfg(scheduler=SchedulerName.STEP, step_size=3, gamma=0.1, warmup_epochs=0)
        s = LRSchedule(cfg, epochs=10, steps_per_epoch=10)
        for e in range(3):
            s.step_epoch(e)
        assert s.current_lr == pytest.approx(1e-4)

    def test_plateau(self):
        from vision_spectra_tpu.training import LRSchedule

        cfg = self._cfg(scheduler=SchedulerName.PLATEAU, plateau_patience=2)
        s = LRSchedule(cfg, epochs=50, steps_per_epoch=10)
        s.step_epoch(0, val_loss=1.0)
        for e in range(1, 5):
            s.step_epoch(e, val_loss=1.0)  # no improvement
        assert s.current_lr == pytest.approx(1e-4)


class TestEvalMetrics:
    def test_confusion_and_f1(self):
        import jax.numpy as jnp

        from vision_spectra_tpu.training import (
            accuracy_from_cm,
            confusion_matrix_update,
            macro_f1_from_cm,
        )

        cm = jnp.zeros((3, 3), jnp.float32)
        preds = jnp.array([0, 1, 2, 2])
        labels = jnp.array([0, 1, 1, 2])
        mask = jnp.ones(4)
        cm = np.asarray(confusion_matrix_update(cm, preds, labels, mask))
        assert cm.sum() == 4
        assert accuracy_from_cm(cm) == pytest.approx(0.75)
        # per-class f1: c0=1.0, c1=2/3, c2=2/3
        assert macro_f1_from_cm(cm) == pytest.approx((1 + 2 / 3 + 2 / 3) / 3)

    def test_auroc_perfect_and_random(self):
        from vision_spectra_tpu.training import macro_auroc

        labels = np.array([0, 0, 1, 1])
        probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9], [0.2, 0.8]])
        assert macro_auroc(probs, labels, 2) == pytest.approx(1.0)
        probs_bad = 1 - probs
        assert macro_auroc(probs_bad, labels, 2) == pytest.approx(0.0)

    def test_auroc_ties(self):
        from vision_spectra_tpu.training import macro_auroc

        labels = np.array([0, 1])
        probs = np.array([[0.5, 0.5], [0.5, 0.5]])
        assert macro_auroc(probs, labels, 2) == pytest.approx(0.5)


class TestFusedTrainer:
    def test_fused_epoch_matches_streaming_statistics(self, tmp_path):
        """Fused-epoch trainer trains and reports sane aggregates."""
        from vision_spectra_tpu.training.fused import FusedClassificationTrainer

        cfg = _tiny_config(tmp_path, name="test_fused")
        cfg = cfg.model_copy(
            update={"training": TrainingConfig(epochs=2, smoke_test=False,
                                               early_stopping=False)}
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        trainer = FusedClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        hist = trainer.train()
        assert 0 < hist["loss"] < 10
        assert 0 <= hist["accuracy"] <= 1
        # two epochs of 32//8 = 4 steps
        assert trainer.global_step == 8
        trainer.cleanup()

    def test_fused_epoch_fn_counts(self):
        import jax
        import jax.numpy as jnp

        from vision_spectra_tpu.config import OptimizerConfig
        from vision_spectra_tpu.losses import make_cross_entropy
        from vision_spectra_tpu.training.fused import make_fused_epoch_fn
        from vision_spectra_tpu.training.state import TrainState, make_optimizer

        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, image_size=28,
                             embed_dim=32, depth=1, drop_path_rate=0.0)
        params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))["params"]
        tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
        state = TrainState.create(params, tx)
        epoch_fn = make_fused_epoch_fn(model, make_cross_entropy(), tx, batch_size=8)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randint(0, 256, (36, 28, 28, 3), dtype=np.uint8))
        labels = jnp.asarray(rng.randint(0, 3, 36).astype(np.int32))
        state2, acc = epoch_fn(state, images, labels, jax.random.key(1),
                               jnp.float32(1e-3))
        loss_sum, correct, count = np.asarray(acc)
        assert count == 32  # 36 // 8 * 8 (drop-last)
        assert int(state2.step) == 4
        assert np.isfinite(loss_sum)

    def test_fused_epoch_indexed_matches_regular(self):
        """The zero-copy (index-gather) shuffle is bit-identical to the
        materialized shuffle: same stats, same updated params."""
        import jax
        import jax.numpy as jnp

        from vision_spectra_tpu.config import OptimizerConfig
        from vision_spectra_tpu.losses import make_cross_entropy
        from vision_spectra_tpu.training.fused import make_fused_epoch_fn
        from vision_spectra_tpu.training.state import TrainState, make_optimizer

        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, image_size=28,
                             embed_dim=32, depth=1, drop_path_rate=0.0)
        params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))["params"]
        tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.randint(0, 256, (32, 28, 28, 3), dtype=np.uint8))
        labels = jnp.asarray(rng.randint(0, 3, 32).astype(np.int32))

        results = []
        for indexed in (False, True):
            fn = make_fused_epoch_fn(
                model, make_cross_entropy(), tx, batch_size=8, indexed=indexed
            )
            state = TrainState.create(
                jax.tree.map(jnp.copy, params), tx
            )
            state, acc = fn(state, images, labels, jax.random.key(7),
                            jnp.float32(1e-3))
            results.append((np.asarray(acc), state.params))
        np.testing.assert_array_equal(results[0][0], results[1][0])
        for a, b in zip(jax.tree.leaves(results[0][1]),
                        jax.tree.leaves(results[1][1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedRegimes:
    """Fused epochs for MIM / multitask / finetune + per-step LR parity."""

    def _mim_model(self, cfg, info):
        encoder = _build_encoder(cfg, info)
        return MIMModel(
            encoder=encoder,
            decoder_embed_dim=cfg.model.decoder_embed_dim,
            decoder_depth=cfg.model.decoder_depth,
            decoder_num_heads=2,
            mask_ratio=cfg.model.mask_ratio,
        )

    def test_fused_mim_trainer(self, tmp_path):
        from vision_spectra_tpu.training.fused import FusedMIMTrainer

        cfg = _tiny_config(tmp_path, name="test_fused_mim")
        cfg = cfg.model_copy(
            update={"training": TrainingConfig(epochs=2, smoke_test=False,
                                               early_stopping=False)}
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        trainer = FusedMIMTrainer(cfg, self._mim_model(cfg, ds.get_info()), ds)
        hist = trainer.train()
        assert hist["loss"] > 0
        assert trainer.global_step == 8  # 2 epochs x 4 steps
        trainer.cleanup()

    def test_fused_multitask_trainer(self, tmp_path):
        from vision_spectra_tpu.training.fused import FusedMultitaskTrainer

        cfg = _tiny_config(tmp_path, name="test_fused_mtl")
        cfg = cfg.model_copy(
            update={"training": TrainingConfig(epochs=1, smoke_test=False,
                                               early_stopping=False)}
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()
        encoder = _build_encoder(cfg, info)
        model = MultitaskViT(
            encoder=encoder,
            decoder_embed_dim=cfg.model.decoder_embed_dim,
            decoder_depth=cfg.model.decoder_depth,
            decoder_num_heads=2,
            mask_ratio=0.5,
        )
        trainer = FusedMultitaskTrainer(cfg, model, ds, get_loss(cfg.loss))
        hist = trainer.train()
        for key in ("loss", "cls_loss", "mim_loss", "accuracy"):
            assert key in hist
        trainer.cleanup()

    def test_aug_output_dtype_policy(self, tmp_path):
        """bf16-compute models get bf16 augment output ONLY in regimes whose
        loss never reads the input: the multitask MIM branch computes its
        reconstruction target from the input, so it must stay f32 (a bf16
        target would quantize the objective)."""
        import jax.numpy as jnp

        from vision_spectra_tpu.training.classification import (
            ClassificationTrainer,
        )
        from vision_spectra_tpu.training.multitask import MultitaskTrainer

        cfg = _tiny_config(tmp_path, name="test_aug_dtype")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()

        def bf16_encoder():
            model, _ = build_vit(
                cfg.model.name, num_classes=info.num_classes,
                num_channels=info.num_channels,
                image_size=info.image_size[0],
                embed_dim=cfg.model.embed_dim, depth=cfg.model.depth,
                dtype=jnp.bfloat16,
            )
            return model

        cls_tr = ClassificationTrainer(
            cfg, bf16_encoder(), ds, get_loss(cfg.loss)
        )
        assert cls_tr._train_augment_fn().keywords["out_dtype"] == jnp.bfloat16
        cls_tr.cleanup()

        mtl = MultitaskViT(
            encoder=bf16_encoder(),
            decoder_embed_dim=cfg.model.decoder_embed_dim,
            decoder_depth=cfg.model.decoder_depth,
            decoder_num_heads=2,
            mask_ratio=0.5,
            dtype=jnp.bfloat16,
        )
        mtl_tr = MultitaskTrainer(cfg, mtl, ds, get_loss(cfg.loss))
        assert mtl_tr._train_augment_fn().keywords["out_dtype"] is None
        mtl_tr.cleanup()

    def test_multitask_indexed_core_matches_regular(self, tmp_path):
        """The multitask zero-copy (index-gather) core is bit-identical to
        augmenting the pre-gathered batch (same params, same stats)."""
        import jax
        import jax.numpy as jnp

        from vision_spectra_tpu.training.multitask import MultitaskTrainer

        cfg = _tiny_config(tmp_path, name="test_mtl_indexed")
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()
        encoder = _build_encoder(cfg, info)
        model = MultitaskViT(
            encoder=encoder,
            decoder_embed_dim=cfg.model.decoder_embed_dim,
            decoder_depth=cfg.model.decoder_depth,
            decoder_num_heads=2,
            mask_ratio=0.5,
        )
        trainer = MultitaskTrainer(cfg, model, ds, get_loss(cfg.loss))
        rng = np.random.RandomState(3)
        full = jnp.asarray(
            rng.randint(0, 256, (16, 28, 28, info.num_channels), dtype=np.uint8)
        )
        idx = jnp.asarray([5, 0, 11, 7], jnp.int32)
        labels = jnp.asarray(rng.randint(0, info.num_classes, 4).astype(np.int32))
        key = jax.random.key(9)
        lr = jnp.float32(1e-3)

        s_reg, st_reg = trainer._train_core(
            trainer.state, jnp.take(full, idx, axis=0), labels, key, lr, None
        )
        s_idx, st_idx = trainer._train_core_indexed(
            trainer.state, full, idx, labels, key, lr, None
        )
        np.testing.assert_array_equal(np.asarray(st_reg), np.asarray(st_idx))
        for a, b in zip(jax.tree.leaves(s_reg.params),
                        jax.tree.leaves(s_idx.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        trainer.cleanup()

    def test_fused_finetune_trainer(self, tmp_path):
        """Finetune fused path honors per-leaf LR multipliers (frozen encoder
        leaves stay bit-identical across a fused epoch)."""
        import jax

        from vision_spectra_tpu.training.fused import FusedFinetuneTrainer
        from vision_spectra_tpu.utils.checkpointing import save_checkpoint
        from vision_spectra_tpu.training.state import TrainState, make_optimizer

        cfg = _tiny_config(tmp_path, name="test_fused_ft")
        cfg = cfg.model_copy(
            update={"training": TrainingConfig(epochs=1, smoke_test=False,
                                               early_stopping=False)}
        )
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        info = ds.get_info()
        model = _build_encoder(cfg, info)
        params = model.init(
            jax.random.key(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
        tx = make_optimizer(cfg.optimizer, 1.0)
        ckpt_path = tmp_path / "pre.msgpack"
        save_checkpoint(ckpt_path, TrainState.create(params, tx), epoch=0)

        trainer = FusedFinetuneTrainer(
            cfg, model, ds, get_loss(cfg.loss),
            pretrained_checkpoint=ckpt_path, freeze_encoder=True,
        )
        before = jax.tree.map(np.asarray, trainer.state.params)
        trainer.train()
        after = jax.tree.map(np.asarray, trainer.state.params)
        # Encoder frozen: every non-head leaf unchanged; head leaves moved.
        import flax.traverse_util as tu

        before_flat = tu.flatten_dict(before, sep=".")
        after_flat = tu.flatten_dict(after, sep=".")
        moved = unmoved = 0
        for k in before_flat:
            same = np.array_equal(before_flat[k], after_flat[k])
            if "head" in k.split("."):
                moved += 0 if same else 1
            else:
                unmoved += 1 if same else 0
                assert same, f"frozen leaf {k} changed"
        assert moved > 0 and unmoved > 0
        trainer.cleanup()

    def test_fused_per_step_lr_matches_streaming(self, tmp_path):
        """With identical keys, fused epoch == sequence of streaming steps."""
        import jax
        import jax.numpy as jnp

        from vision_spectra_tpu.config import OptimizerConfig
        from vision_spectra_tpu.losses import make_cross_entropy
        from vision_spectra_tpu.training.fused import make_fused_epoch_fn
        from vision_spectra_tpu.training.state import (
            TrainState,
            apply_updates,
            make_optimizer,
        )

        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, image_size=28,
                             embed_dim=32, depth=1, drop_path_rate=0.0)
        params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))["params"]
        tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
        loss_fn = make_cross_entropy()
        epoch_fn = make_fused_epoch_fn(
            model, loss_fn, tx, batch_size=8, augment=False
        )
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randint(0, 256, (24, 28, 28, 3), dtype=np.uint8))
        labels = jnp.asarray(rng.randint(0, 3, 24).astype(np.int32))
        lrs = jnp.asarray([1e-3, 5e-4, 1e-4], jnp.float32)  # per-step warmup ramp
        key = jax.random.key(7)
        # Copy params first: the fused epoch donates (deletes) its input state.
        params_copy = jax.tree.map(jnp.array, params)
        state = TrainState.create(params_copy, tx)
        fused_state, _ = epoch_fn(state, images, labels, key, lrs)

        # Replay the same permutation/keys/lrs with individual steps.
        k_perm, k_steps = jax.random.split(key)
        order = np.asarray(jax.random.permutation(k_perm, 24))
        state2 = TrainState.create(params, tx)
        for i in range(3):
            idx = order[i * 8 : (i + 1) * 8]
            k = jax.random.fold_in(k_steps, i)
            _k_aug, k_drop = jax.random.split(k)
            x = images[idx].astype(jnp.float32)

            def compute_loss(p):
                logits = model.apply({"params": p}, x, deterministic=False,
                                     rngs={"dropout": k_drop})
                return loss_fn(logits, labels[idx])

            _loss, grads = jax.value_and_grad(compute_loss)(state2.params)
            state2 = apply_updates(state2, grads, tx, lrs[i], None)

        for a, b in zip(jax.tree.leaves(fused_state.params),
                        jax.tree.leaves(state2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


class TestKeepTopK:
    def test_periodic_checkpoints_pruned(self, tmp_path):
        """keep_top_k bounds periodic epoch checkpoints; best.msgpack stays.

        (The reference accepts keep_top_k but never enforces it —
        settings.py:182; enforced here as a documented improvement.)
        """
        from vision_spectra_tpu import tracking
        from vision_spectra_tpu.training import ClassificationTrainer

        cfg = _tiny_config(tmp_path, name="test_topk")
        cfg = cfg.model_copy(update={
            "training": TrainingConfig(
                epochs=5, smoke_test=False, early_stopping=False,
                save_every_n_epochs=1, keep_top_k=2,
            ),
        })
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        model = _build_encoder(cfg, ds.get_info())
        trainer = ClassificationTrainer(cfg, model, ds, get_loss(cfg.loss))
        trainer.train()
        client = tracking.MlflowClient(cfg.output_dir)
        exp = client.get_experiment_by_name("test_topk")
        runs = client.search_runs([exp.experiment_id])
        from pathlib import Path

        art = Path(runs[0].info.artifact_uri.replace("file://", ""))
        ckpts = sorted(p.name for p in (art / "checkpoints").glob("*.msgpack"))
        epoch_ckpts = [c for c in ckpts if c.startswith("epoch_")]
        assert len(epoch_ckpts) == 2, ckpts
        assert epoch_ckpts == ["epoch_0004.msgpack", "epoch_0005.msgpack"]
        assert "best.msgpack" in ckpts
        trainer.cleanup()


class TestFlatAdamW:
    """Flat-buffer AdamW vs the per-leaf optax chain (training/state.py).

    The flat implementation must be a drop-in: same trajectories to f32
    rounding (only the global-norm reduction grouping differs), same
    lr_mult semantics, same factory dispatch.
    """

    def _tree(self, seed=0):
        rng = np.random.RandomState(seed)
        return {
            "dense": {"kernel": jnp.asarray(rng.randn(16, 8), jnp.float32),
                      "bias": jnp.asarray(rng.randn(8), jnp.float32)},
            "norm": {"scale": jnp.asarray(rng.randn(16), jnp.float32)},
        }

    def _run(self, tx, params, grads_seq, lr, lr_mult=None):
        from vision_spectra_tpu.training.state import TrainState, apply_updates

        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        for g in grads_seq:
            state = apply_updates(state, g, tx, lr, lr_mult)
        return jax.tree.map(np.asarray, state.params)

    @pytest.mark.parametrize("clip,scale", [(1.0, 1.0), (0.05, 40.0), (0.0, 1.0)])
    def test_matches_optax_chain(self, clip, scale):
        """5 steps of flat AdamW == 5 steps of the optax chain (both below
        and above the clip threshold, and with clipping disabled)."""
        from vision_spectra_tpu.config import OptimizerConfig
        from vision_spectra_tpu.training.state import FlatAdamW, make_optimizer

        cfg = OptimizerConfig()  # adamw, wd per config default
        params = self._tree()
        grads_seq = [
            jax.tree.map(
                lambda p, i=i: jnp.asarray(
                    np.random.RandomState(10 + i).randn(*p.shape) * scale,
                    jnp.float32,
                ),
                params,
            )
            for i in range(5)
        ]
        flat = make_optimizer(cfg, gradient_clip=clip)
        assert isinstance(flat, FlatAdamW)
        chain = make_optimizer(cfg, gradient_clip=clip, flat=False)
        out_flat = self._run(flat, params, grads_seq, jnp.float32(1e-2))
        out_chain = self._run(chain, params, grads_seq, jnp.float32(1e-2))
        for kf, kc in zip(jax.tree.leaves(out_flat), jax.tree.leaves(out_chain)):
            np.testing.assert_allclose(kf, kc, rtol=2e-6, atol=2e-7)

    def test_lr_mult_matches_optax(self):
        """Per-leaf multipliers (incl. a frozen 0.0 leaf) match the chain."""
        from vision_spectra_tpu.config import OptimizerConfig
        from vision_spectra_tpu.training.state import make_optimizer

        cfg = OptimizerConfig()
        params = self._tree(1)
        grads = [jax.tree.map(
            lambda p: jnp.asarray(
                np.random.RandomState(3).randn(*p.shape), jnp.float32),
            params,
        )]
        lr_mult = {"dense": {"kernel": 0.1, "bias": 0.0}, "norm": {"scale": 1.0}}
        out_flat = self._run(
            make_optimizer(cfg, 1.0), params, grads, jnp.float32(1e-2), lr_mult
        )
        out_chain = self._run(
            make_optimizer(cfg, 1.0, flat=False), params, grads,
            jnp.float32(1e-2), lr_mult,
        )
        for kf, kc in zip(jax.tree.leaves(out_flat), jax.tree.leaves(out_chain)):
            np.testing.assert_allclose(kf, kc, rtol=2e-6, atol=2e-7)
        # The frozen leaf must be bit-identical to its initial value.
        np.testing.assert_array_equal(
            out_flat["dense"]["bias"], np.asarray(params["dense"]["bias"])
        )

    def test_factory_dispatch(self):
        """adamw/adam -> FlatAdamW (flat default); sgd and flat=False -> optax."""
        import optax

        from vision_spectra_tpu.config import OptimizerConfig, OptimizerName
        from vision_spectra_tpu.training.state import FlatAdamW, make_optimizer

        assert isinstance(make_optimizer(OptimizerConfig(), 1.0), FlatAdamW)
        adam = make_optimizer(
            OptimizerConfig(name=OptimizerName.ADAM, weight_decay=0.1), 0.0
        )
        assert isinstance(adam, FlatAdamW)
        assert adam.weight_decay == 0.0  # reference adam branch ignores wd
        assert isinstance(
            make_optimizer(OptimizerConfig(), 1.0, flat=False),
            optax.GradientTransformation,
        )
        assert isinstance(
            make_optimizer(OptimizerConfig(name=OptimizerName.SGD), 1.0),
            optax.GradientTransformation,
        )
