"""Deeper model-numerics tests: init statistics, attention math, drop-path,
masking statistics, config round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_spectra_tpu.config import (
    DatasetConfig,
    ExperimentConfig,
    LossName,
    SchedulerName,
)
from vision_spectra_tpu.models import build_vit, parse_model_name, random_masking


class TestModelNameParsing:
    def test_variants(self):
        assert parse_model_name("vit_tiny_patch16_224") == {
            "embed_dim": 192, "depth": 12, "num_heads": 3, "patch_size": 16,
        }
        assert parse_model_name("vit_small_patch16_224")["embed_dim"] == 384
        assert parse_model_name("vit_base_patch16_224")["num_heads"] == 12
        assert parse_model_name("deit_tiny_patch16_224")["embed_dim"] == 192
        assert parse_model_name("vit_tiny_patch4_28")["patch_size"] == 4

    def test_auto_heads(self):
        _, desc = build_vit("vit_tiny_patch16_224", num_classes=3, embed_dim=96)
        assert desc.num_heads == 3  # max(1, 96 // 32)
        _, desc = build_vit("vit_tiny_patch16_224", num_classes=3, embed_dim=32)
        assert desc.num_heads == 1
        _, desc = build_vit("vit_tiny_patch16_224", num_classes=3,
                            embed_dim=96, num_heads=6)
        assert desc.num_heads == 6  # explicit wins


class TestInitStatistics:
    def test_trunc_normal_kernels(self):
        """timm-faithful init: torch trunc_normal_(std=.02, a=-2, b=2) has
        ABSOLUTE cutoffs — effectively an untruncated N(0, 0.02) whose
        sample std is exactly 0.02 (flax's ±2σ truncation would shrink it
        to 0.0176 and hard-clip at 0.04; VERDICT r1 item 7)."""
        model, _ = build_vit("vit_tiny_patch16_224", num_classes=9, image_size=28)
        params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))["params"]
        qkv = np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"])
        assert abs(qkv.mean()) < 3e-3
        assert 0.0195 < qkv.std() < 0.0205  # matches timm's effective std
        assert np.abs(qkv).max() > 0.045  # tail NOT clipped at 2 sigma

    def test_init_std_matches_torch_reference(self):
        """Sample std of the initializer equals torch's trunc_normal_ to
        within Monte-Carlo error (the distribution timm actually draws)."""
        torch = pytest.importorskip("torch")

        from vision_spectra_tpu.models.vit import timm_trunc_normal

        t = torch.empty(1000, 1000)
        torch.nn.init.trunc_normal_(t, std=0.02)
        x = np.asarray(
            timm_trunc_normal(0.02)(jax.random.key(1), (1000, 1000), jnp.float32)
        )
        assert abs(x.std() - t.std().item()) < 3e-4
        assert abs(x.std() - 0.02) < 3e-4

    def test_biases_zero_norms_unit(self):
        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, embed_dim=32, depth=1)
        params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))["params"]
        np.testing.assert_array_equal(
            np.asarray(params["blocks_0"]["attn"]["qkv"]["bias"]), 0.0
        )
        np.testing.assert_array_equal(
            np.asarray(params["blocks_0"]["norm1"]["scale"]), 1.0
        )


class TestDropPath:
    def test_linear_ramp(self):
        """Drop-path rates ramp 0 → rate across depth (timm schedule)."""
        model, _ = build_vit(
            "vit_tiny_patch16_224", num_classes=3, depth=4, drop_path_rate=0.3
        )
        # Rates are internal to setup; verify via the blocks' config.
        model_bound = model.bind(
            model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
        )
        rates = [blk.drop_path for blk in model_bound.blocks]
        assert rates[0] == 0.0
        assert rates[-1] == pytest.approx(0.3)
        assert all(b >= a for a, b in zip(rates, rates[1:]))

    def test_deterministic_is_identity(self):
        from vision_spectra_tpu.models.vit import DropPath

        x = jnp.ones((4, 3, 8))
        dp = DropPath(rate=0.5)
        out = dp.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestRandomMasking:
    def test_mask_statistics(self):
        """Exactly N - int(N(1-r)) patches masked per sample."""
        x = jnp.ones((8, 49, 16))
        visible, mask, ids_restore = random_masking(x, 0.75, jax.random.key(0))
        num_keep = int(49 * 0.25)
        assert visible.shape == (8, num_keep, 16)
        np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), 49 - num_keep)

    def test_restore_indices_are_permutations(self):
        x = jnp.ones((4, 49, 8))
        _, _, ids_restore = random_masking(x, 0.5, jax.random.key(1))
        for row in np.asarray(ids_restore):
            assert sorted(row) == list(range(49))

    def test_visible_patches_come_from_input(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
        visible, mask, _ = random_masking(x, 0.5, jax.random.key(2))
        x_np = np.asarray(x)
        vis_np = np.asarray(visible)
        for b in range(2):
            for patch in vis_np[b]:
                assert any(np.allclose(patch, row) for row in x_np[b])


class TestAttentionMapProperties:
    def test_rows_sum_to_one_and_shape(self):
        model, _ = build_vit("vit_tiny_patch4_28", num_classes=3, embed_dim=32,
                             depth=2, drop_path_rate=0.0)
        v = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 3), jnp.float32)
        maps = model.apply(v, x, method=model.get_attention_weights)
        assert len(maps) == 2
        assert maps[0].shape == (2, 1, 50, 50)  # 49 patches + CLS
        np.testing.assert_allclose(np.asarray(maps[0].sum(-1)), 1.0, rtol=1e-5)


class TestConfigSystem:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = ExperimentConfig(
            name="rt", seed=7,
            dataset=DatasetConfig(batch_size=128),
        )
        cfg.loss.classification = LossName.FOCAL
        cfg.optimizer.scheduler = SchedulerName.STEP
        path = tmp_path / "cfg.yaml"
        cfg.to_yaml(path)
        loaded = ExperimentConfig.from_yaml(path)
        assert loaded.name == "rt"
        assert loaded.seed == 7
        assert loaded.dataset.batch_size == 128
        assert loaded.loss.classification == LossName.FOCAL
        assert loaded.optimizer.scheduler == SchedulerName.STEP

    def test_flat_dict(self):
        flat = ExperimentConfig().to_flat_dict()
        assert flat["dataset.batch_size"] == 64
        assert flat["optimizer.name"] == "adamw"
        assert "spectral.layers" in flat  # lists stringified

    def test_device_coercion(self):
        assert ExperimentConfig(device="cuda").device == "auto"
        assert ExperimentConfig(device="mps").device == "auto"
        assert ExperimentConfig(device="cpu").device == "cpu"
        with pytest.raises(Exception):
            ExperimentConfig(device="gpu9000")

    def test_validation_ranges(self):
        with pytest.raises(Exception):
            DatasetConfig(batch_size=0)
        with pytest.raises(Exception):
            DatasetConfig(sample_ratio=1.5)

    def test_env_settings(self, monkeypatch):
        from vision_spectra_tpu.config import EnvSettings

        monkeypatch.setenv("VISION_SPECTRA_SEED", "99")
        monkeypatch.setenv("VISION_SPECTRA_DEVICE", "cpu")
        env = EnvSettings()
        assert env.seed == 99
        assert env.device == "cpu"


class TestSliceBeforeNorm:
    """__call__ slices the CLS token BEFORE the final LayerNorm (round-5
    perf fix); LN is per-token, so logits must equal the norm-then-slice
    formulation head(forward_features(x)[:, 0]) exactly."""

    def test_call_equals_norm_then_slice(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vision_spectra_tpu.models import build_vit

        model, _ = build_vit(
            "vit_tiny_patch4_28", num_classes=5, embed_dim=64, depth=2,
            num_heads=2, drop_path_rate=0.0,
        )
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 28, 28, 3).astype(np.float32))
        params = model.init(jax.random.key(0), x)["params"]
        logits = model.apply({"params": params}, x, deterministic=True)
        feats = model.apply({"params": params}, x, deterministic=True,
                            method="forward_features")
        cls = feats[:, 0]
        ref = (cls @ params["head"]["kernel"]
               + params["head"]["bias"]).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                                   rtol=0, atol=2e-6)
