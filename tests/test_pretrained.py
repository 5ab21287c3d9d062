"""Pretrained-weight import: timm/torch ViT state dicts → Flax pytrees.

Validates the two nontrivial layout transforms numerically against torch's
own ops (conv2d patch embedding, linear qkv), the pos-embed grid resize,
head semantics, file round trips, and the config/trainer wiring
(reference: vision_spectra/models/vit.py:64-78 loads from timm's zoo; here
the source is a file).
"""

from __future__ import annotations

import numpy as np
import pytest

# CPU torch is baked into the dev image but is NOT a package dependency;
# skip (don't fail collection) where it is absent, e.g. a bare CI runner.
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vision_spectra_tpu.models import build_vit
from vision_spectra_tpu.models.pretrained import (
    import_pretrained,
    load_timm_state_dict,
    resize_pos_embed,
    timm_to_flax,
)

E, DEPTH, HEADS, PATCH, IMG, C, K = 32, 2, 2, 4, 8, 3, 5


def make_timm_sd(rng, *, grid=None, num_classes=K):
    """Synthetic timm-format ViT state dict (torch tensor values)."""
    g = (IMG // PATCH) if grid is None else grid
    n_pos = g * g + 1
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32))  # noqa: E731
    sd = {
        "cls_token": t(1, 1, E),
        "pos_embed": t(1, n_pos, E),
        "patch_embed.proj.weight": t(E, C, PATCH, PATCH),
        "patch_embed.proj.bias": t(E),
        "norm.weight": t(E),
        "norm.bias": t(E),
        "head.weight": t(num_classes, E),
        "head.bias": t(num_classes),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": t(E), p + "norm1.bias": t(E),
            p + "attn.qkv.weight": t(3 * E, E), p + "attn.qkv.bias": t(3 * E),
            p + "attn.proj.weight": t(E, E), p + "attn.proj.bias": t(E),
            p + "norm2.weight": t(E), p + "norm2.bias": t(E),
            p + "mlp.fc1.weight": t(4 * E, E), p + "mlp.fc1.bias": t(4 * E),
            p + "mlp.fc2.weight": t(E, 4 * E), p + "mlp.fc2.bias": t(E),
        })
    return sd


def fresh_model_params(seed=0):
    model, _ = build_vit(
        f"vit_tiny_patch{PATCH}_224", num_classes=K, num_channels=C,
        image_size=IMG, embed_dim=E, depth=DEPTH, num_heads=HEADS,
        drop_path_rate=0.0,
    )
    x = jnp.zeros((2, IMG, IMG, C), jnp.float32)
    params = model.init(jax.random.key(seed), x)["params"]
    return model, params


class TestLayoutTransforms:
    def test_patch_embed_matches_torch_conv(self):
        """Imported patch kernel reproduces timm's stride-p conv exactly."""
        rng = np.random.RandomState(0)
        sd = make_timm_sd(rng)
        model, params = fresh_model_params()
        merged, loaded, _ = import_pretrained(params, sd)

        img = rng.randn(2, C, IMG, IMG).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.tensor(img), sd["patch_embed.proj.weight"],
            sd["patch_embed.proj.bias"], stride=PATCH,
        )  # [2, E, g, g]
        g = IMG // PATCH
        ref = ref.reshape(2, E, g * g).permute(0, 2, 1).numpy()

        x_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
        kern = merged["patch_embed"]["kernel"]
        bias = merged["patch_embed"]["bias"]
        b, h, w, c = x_nhwc.shape
        p = PATCH
        xr = x_nhwc.reshape(b, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
        ours = np.asarray(xr.reshape(b, g * g, p * p * c) @ kern + bias)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_qkv_transpose_matches_torch_linear(self):
        rng = np.random.RandomState(1)
        sd = make_timm_sd(rng)
        _, params = fresh_model_params()
        merged, _, _ = import_pretrained(params, sd)
        tokens = rng.randn(7, E).astype(np.float32)
        ref = torch.nn.functional.linear(
            torch.tensor(tokens), sd["blocks.0.attn.qkv.weight"],
            sd["blocks.0.attn.qkv.bias"],
        ).numpy()
        blk = merged["blocks_0"]["attn"]["qkv"]
        ours = tokens @ np.asarray(blk["kernel"]) + np.asarray(blk["bias"])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
        # timm chunk order q;k;v lands on the fused-column split.
        q_cols = np.asarray(blk["kernel"])[:, :E]
        np.testing.assert_array_equal(
            q_cols, sd["blocks.0.attn.qkv.weight"].numpy()[:E].T
        )

    def test_all_encoder_tensors_load(self):
        rng = np.random.RandomState(2)
        sd = make_timm_sd(rng)
        _, params = fresh_model_params()
        merged, loaded, skipped = import_pretrained(params, sd)
        # Everything except the (skipped-by-default) head transfers.
        assert all(s.startswith("head.") for s in skipped)
        n_leaves = len(jax.tree.leaves(params))
        assert len(loaded) == n_leaves - 2  # head kernel + bias
        np.testing.assert_array_equal(
            np.asarray(merged["norm_out"]["scale"]), sd["norm.weight"].numpy()
        )

    def test_forward_runs_and_differs_from_fresh(self):
        rng = np.random.RandomState(3)
        sd = make_timm_sd(rng)
        model, params = fresh_model_params()
        merged, _, _ = import_pretrained(params, sd)
        x = jnp.asarray(rng.randn(2, IMG, IMG, C).astype(np.float32))
        fresh = model.apply({"params": params}, x, deterministic=True)
        warm = model.apply({"params": merged}, x, deterministic=True)
        assert np.isfinite(np.asarray(warm)).all()
        assert np.abs(np.asarray(warm) - np.asarray(fresh)).max() > 1e-3


class TestPosEmbedResize:
    def test_cls_row_preserved_and_grid_resized(self):
        rng = np.random.RandomState(4)
        pos = rng.randn(1, 1 + 14 * 14, E).astype(np.float32)
        out = resize_pos_embed(pos, num_patches=4)
        assert out.shape == (1, 5, E)
        np.testing.assert_array_equal(out[:, 0], pos[:, 0])

    def test_identity_when_grids_match(self):
        rng = np.random.RandomState(5)
        pos = rng.randn(1, 5, E).astype(np.float32)
        assert resize_pos_embed(pos, num_patches=4) is pos

    def test_import_from_224_grid(self):
        """A 14×14-grid (img-224) dict imports into the 2×2-grid model."""
        rng = np.random.RandomState(6)
        sd = make_timm_sd(rng, grid=14)
        _, params = fresh_model_params()
        merged, loaded, _ = import_pretrained(params, sd)
        assert "pos_embed" in {n.split(".")[0] for n in loaded}
        assert merged["pos_embed"].shape == params["pos_embed"].shape


class TestHeadSemantics:
    def test_head_kept_fresh_by_default(self):
        rng = np.random.RandomState(7)
        sd = make_timm_sd(rng)
        _, params = fresh_model_params()
        merged, _, _ = import_pretrained(params, sd)
        np.testing.assert_array_equal(
            np.asarray(merged["head"]["kernel"]),
            np.asarray(params["head"]["kernel"]),
        )

    def test_head_loaded_on_request_when_shapes_match(self):
        rng = np.random.RandomState(8)
        sd = make_timm_sd(rng)
        _, params = fresh_model_params()
        merged, _, _ = import_pretrained(params, sd, load_head=True)
        np.testing.assert_array_equal(
            np.asarray(merged["head"]["kernel"]),
            sd["head.weight"].numpy().T,
        )

    def test_mismatched_head_skipped_even_on_request(self):
        rng = np.random.RandomState(9)
        sd = make_timm_sd(rng, num_classes=1000)
        _, params = fresh_model_params()
        merged, _, skipped = import_pretrained(params, sd, load_head=True)
        assert any(s.startswith("head.") for s in skipped)
        np.testing.assert_array_equal(
            np.asarray(merged["head"]["kernel"]),
            np.asarray(params["head"]["kernel"]),
        )


class TestFileRoundTrip:
    def test_pth_with_envelope(self, tmp_path):
        rng = np.random.RandomState(10)
        sd = make_timm_sd(rng)
        path = tmp_path / "ckpt.pth"
        torch.save({"model": sd}, path)
        loaded = load_timm_state_dict(path)
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(loaded["cls_token"], sd["cls_token"].numpy())

    def test_npz(self, tmp_path):
        rng = np.random.RandomState(11)
        sd = {k: v.numpy() for k, v in make_timm_sd(rng).items()}
        path = tmp_path / "ckpt.npz"
        np.savez(path, **sd)
        loaded = load_timm_state_dict(path)
        _, params = fresh_model_params()
        merged, n_loaded, _ = import_pretrained(params, loaded)
        assert len(n_loaded) > 0

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_timm_state_dict(tmp_path / "nope.pth")

    def test_garbage_dict_raises(self):
        _, params = fresh_model_params()
        with pytest.raises(ValueError, match="zero tensors"):
            import_pretrained(params, {"totally": np.zeros(3)})


def _trainer_config(tmp_path, **model_overrides):
    from vision_spectra_tpu.config import (
        DatasetConfig,
        DatasetName,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        SpectralConfig,
        TrainingConfig,
    )

    return ExperimentConfig(
        name="test_pretrained",
        seed=42,
        dataset=DatasetConfig(
            name=DatasetName.SYNTHETIC, image_size=IMG, batch_size=8,
            num_classes=K, num_samples_train=32, num_samples_val=16,
            num_samples_test=16,
        ),
        model=ModelConfig(
            name=f"vit_tiny_patch{PATCH}_28", embed_dim=E, depth=DEPTH,
            num_heads=HEADS, drop_path_rate=0.0, **model_overrides,
        ),
        training=TrainingConfig(epochs=1, smoke_test=True),
        optimizer=OptimizerConfig(warmup_epochs=1),
        spectral=SpectralConfig(enabled=False),
        output_dir=tmp_path / "mlruns",
        data_dir=tmp_path / "data",
    )


def _build(cfg, ds):
    info = ds.get_info()
    model, _ = build_vit(
        cfg.model.name, num_classes=info.num_classes,
        num_channels=info.num_channels, image_size=cfg.dataset.image_size,
        drop_path_rate=cfg.model.drop_path_rate,
        embed_dim=cfg.model.embed_dim, depth=cfg.model.depth,
        num_heads=cfg.model.num_heads,
    )
    return model


class TestWiring:
    def test_trainer_applies_pretrained_path(self, tmp_path):
        """ModelConfig.pretrained_path loads the weights at trainer init."""
        rng = np.random.RandomState(12)
        sd = make_timm_sd(rng)
        path = tmp_path / "timm.pth"
        torch.save(sd, path)

        cfg = _trainer_config(tmp_path, pretrained=True, pretrained_path=path)

        from vision_spectra_tpu.data import get_dataset
        from vision_spectra_tpu.losses import get_loss
        from vision_spectra_tpu.training import ClassificationTrainer

        ds = get_dataset(cfg.dataset, cfg.data_dir)
        trainer = ClassificationTrainer(cfg, _build(cfg, ds), ds, get_loss(cfg.loss))
        got = np.asarray(trainer.state.params["cls_token"])
        np.testing.assert_allclose(got, sd["cls_token"].numpy(), rtol=1e-6)
        trainer.cleanup()

    def test_env_path_only_honored_when_pretrained_true(self, tmp_path,
                                                        monkeypatch):
        """A leaked VISION_SPECTRA_PRETRAINED_PATH must never flip a
        from-scratch run (pretrained=False) to pretrained init; with
        pretrained=True it supplies the path."""
        rng = np.random.RandomState(12)
        sd = make_timm_sd(rng)
        path = tmp_path / "timm.pth"
        torch.save(sd, path)
        monkeypatch.setenv("VISION_SPECTRA_PRETRAINED_PATH", str(path))

        from vision_spectra_tpu.data import get_dataset
        from vision_spectra_tpu.losses import get_loss
        from vision_spectra_tpu.training import ClassificationTrainer

        # pretrained=False (default): env var ignored, fresh init.
        cfg = _trainer_config(tmp_path)
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        trainer = ClassificationTrainer(cfg, _build(cfg, ds), ds, get_loss(cfg.loss))
        got = np.asarray(trainer.state.params["cls_token"])
        trainer.cleanup()
        assert not np.allclose(got, sd["cls_token"].numpy())

        # pretrained=True with no config path: env var supplies it.
        cfg = _trainer_config(tmp_path, pretrained=True)
        ds = get_dataset(cfg.dataset, cfg.data_dir)
        trainer = ClassificationTrainer(cfg, _build(cfg, ds), ds, get_loss(cfg.loss))
        got = np.asarray(trainer.state.params["cls_token"])
        trainer.cleanup()
        np.testing.assert_allclose(got, sd["cls_token"].numpy(), rtol=1e-6)

    def test_pretrained_true_without_path_raises(self, tmp_path):
        cfg = _trainer_config(tmp_path, pretrained=True)

        from vision_spectra_tpu.data import get_dataset
        from vision_spectra_tpu.losses import get_loss
        from vision_spectra_tpu.training import ClassificationTrainer

        ds = get_dataset(cfg.dataset, cfg.data_dir)
        with pytest.raises(ValueError, match="pretrained"):
            ClassificationTrainer(cfg, _build(cfg, ds), ds, get_loss(cfg.loss))
