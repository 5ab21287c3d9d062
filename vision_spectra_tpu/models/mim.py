"""Masked image modeling (MAE-style) model in Flax.

Reference behavior: vision_spectra/models/mim.py:23-417. Semantics preserved:

- random masking by argsort of per-sample uniform noise, keeping the first
  ``int(N·(1−ratio))`` patches; binary mask restored via double-argsort
  gather (mim.py:260-296) — this ports directly to
  ``jax.random.uniform`` + ``jnp.argsort`` + ``take_along_axis`` and stays
  fully static-shaped under jit (``num_keep`` is Python-static),
- encoder runs on [CLS + visible patches] with position embeddings added
  *before* masking (mim.py:298-339),
- lightweight decoder: linear projection to the decoder dim, learnable mask
  token, gather-based unshuffle, separate learnable decoder position
  embeddings, pre-LN blocks, linear pixel head predicting ``p²·C`` values
  (mim.py:90-137); xavier-uniform init (mim.py:77-88),
- loss: MSE on masked patches only, with optional per-patch pixel
  normalization ``(t−μ)/√(σ²+1e−6)`` (mim.py:359-391).

Images are NHWC (the framework-wide layout).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_spectra_tpu.models.vit import Attention, Mlp, ViTClassifier

xavier_init = nn.initializers.xavier_uniform()


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, N, p²·C] (flatten order p1, p2, c as reference)."""
    b, hh, ww, c = imgs.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = imgs[:, : h * p, : w * p, :].reshape(b, h, p, w, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * w, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int, image_size: int, channels: int) -> jnp.ndarray:
    """[B, N, p²·C] → [B, H, W, C]."""
    b, n, _ = x.shape
    p = patch_size
    h = w = image_size // p
    x = x.reshape(b, h, w, p, p, channels)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, channels)


def random_masking(
    x: jnp.ndarray, mask_ratio: float, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MAE random masking (reference: mim.py:260-296).

    Returns (visible patches [B, L, D], binary mask [B, N] with 1 = masked,
    ids_restore [B, N]). ``L = int(N·(1−ratio))`` is static under jit.
    """
    b, n, d = x.shape
    num_keep = int(n * (1 - mask_ratio))
    noise = jax.random.uniform(key, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :num_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[..., None], axis=1)

    mask = jnp.ones((b, n))
    mask = mask.at[:, :num_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def mim_reconstruction_loss(
    imgs: jnp.ndarray,
    pred: jnp.ndarray,
    mask: jnp.ndarray,
    patch_size: int,
    norm_pix_loss: bool = True,
) -> jnp.ndarray:
    """Masked-patch MSE with optional per-patch target normalization."""
    # Target statistics always in f32: a bf16 input (e.g. a bench pipeline
    # emitting bf16 from augmentation) must not push the per-patch mean/var/
    # sqrt chain into bf16 — that would quantize the training objective.
    target = patchify(imgs.astype(jnp.float32), patch_size)
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    loss = jnp.mean((pred - target) ** 2, axis=-1)  # [B, N]
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class DecoderBlock(nn.Module):
    """Pre-LN decoder block (reference TransformerBlock, mim.py:140-178)."""

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.dim, self.num_heads, dtype=self.dtype, name="attn"
        )(y, deterministic=deterministic)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y, deterministic=deterministic)
        return x + y


class MIMDecoder(nn.Module):
    """Lightweight MAE decoder (reference: mim.py:23-137).

    The decoder blocks run through the fused whole-block Pallas kernel on
    the same gate as the encoder (round-5 measurement: the 2 XLA decoder
    blocks cost 100.9 ms of the 165.8 ms MIM step at [8192, 49, 128] —
    nearly 2x the entire fused 12-block encoder; results/
    bench_mim_breakdown.py). ``mesh`` / ``use_fused_blocks`` mirror the
    encoder's attributes and are plumbed by MIMModel/MultitaskViT."""

    encoder_embed_dim: int = 192
    decoder_embed_dim: int = 128
    decoder_depth: int = 2
    decoder_num_heads: int = 4
    patch_size: int = 4
    num_channels: int = 3
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    use_fused_blocks: bool | None = None
    mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ids_restore: jnp.ndarray,
        pos_embed: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Visible latents [B, L, E] + restore indices → pixel predictions [B, N, p²C]."""
        d = self.decoder_embed_dim
        x = nn.Dense(
            d,
            kernel_init=xavier_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="decoder_embed",
        )(x)

        mask_token = self.param(
            "mask_token",
            nn.initializers.normal(stddev=0.02),
            (1, 1, d),
            jnp.float32,
        )
        b, n_visible, _ = x.shape
        n_total = ids_restore.shape[1]
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(x.dtype), (b, n_total - n_visible, d)
        )
        x_full = jnp.concatenate([x, mask_tokens], axis=1)
        x_full = jnp.take_along_axis(x_full, ids_restore[..., None], axis=1)

        if pos_embed is not None:
            x_full = x_full + pos_embed[:, 1:, :].astype(x_full.dtype)  # skip CLS slot

        if self._fused_decoder_active(x_full):
            x_full = self._decode_fused(x_full)
        else:
            for i in range(self.decoder_depth):
                x_full = DecoderBlock(
                    d,
                    self.decoder_num_heads,
                    self.mlp_ratio,
                    dtype=self.dtype,
                    name=f"decoder_blocks_{i}",
                )(x_full, deterministic=deterministic)
        x_full = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(x_full)
        return nn.Dense(
            self.patch_size * self.patch_size * self.num_channels,
            kernel_init=xavier_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="decoder_pred",
        )(x_full).astype(jnp.float32)

    def _fused_decoder_active(self, x: jnp.ndarray) -> bool:
        """Same gate as the encoder (models/vit.fused_stack_serves); the
        decoder has no dropout/drop-path, so only geometry/backend apply.
        During init the XLA path must run so the params exist."""
        from vision_spectra_tpu.models.vit import fused_stack_serves

        if self.use_fused_blocks is False or self.is_initializing():
            return False
        b, n, _ = x.shape
        return fused_stack_serves(
            b, n, self.decoder_embed_dim, mesh=self.mesh,
            use_fused=self.use_fused_blocks,
        )

    def _decode_fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """Decoder blocks via the fused whole-block kernel (no drop-path:
        unit masks). Params read from the identical pytree the XLA path
        builds, so checkpoints and extraction are unaffected."""
        import jax

        from vision_spectra_tpu.models.vit import (
            collect_block_params,
            run_fused_stack,
        )
        from vision_spectra_tpu.ops.block_fused import padded_tokens

        interpret = jax.default_backend() != "tpu"
        b, n_real, e = x.shape
        n = padded_tokens(n_real)
        if n != n_real:
            x = jnp.pad(x, ((0, 0), (0, n - n_real), (0, 0)))
        rows = b * n
        params_all = collect_block_params(
            self.variables["params"], e, self.decoder_depth,
            name_fmt="decoder_blocks_{i}",
        )
        ones = jnp.ones((rows, 1), jnp.float32)
        masks = jnp.broadcast_to(ones, (self.decoder_depth, rows, 1))
        h = run_fused_stack(
            params_all, x.reshape(rows, e), masks, masks,
            num_heads=self.decoder_num_heads, n=n, n_real=n_real,
            mesh=self.mesh, interpret=interpret,
        )
        h = h.reshape(b, n, e)
        return h[:, :n_real] if n != n_real else h


class MIMModel(nn.Module):
    """ViT encoder + MAE decoder for self-supervised pretraining.

    ``__call__(imgs)`` needs an ``rngs={'mask': key}`` (and ``'dropout'`` when
    non-deterministic) and returns ``(loss, pred, mask)`` exactly as the
    reference forward (mim.py:393-417).
    """

    encoder: ViTClassifier
    decoder_embed_dim: int = 128
    decoder_depth: int = 2
    decoder_num_heads: int = 4
    mask_ratio: float = 0.75
    norm_pix_loss: bool = True
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.decoder = MIMDecoder(
            encoder_embed_dim=self.encoder.embed_dim,
            decoder_embed_dim=self.decoder_embed_dim,
            decoder_depth=self.decoder_depth,
            decoder_num_heads=self.decoder_num_heads,
            patch_size=self.encoder.patch_size,
            num_channels=self.encoder.num_channels,
            dtype=self.dtype,
            use_fused_blocks=self.encoder.use_fused_blocks,
            mesh=self.encoder.mesh,
        )
        self.decoder_pos_embed = self.param(
            "decoder_pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.encoder.num_patches + 1, self.decoder_embed_dim),
            jnp.float32,
        )

    @property
    def patch_size(self) -> int:
        return self.encoder.patch_size

    def forward_encoder(
        self, x: jnp.ndarray, mask_ratio: float, deterministic: bool = True
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Masked encoding (reference: mim.py:298-339)."""
        enc = self.encoder
        tokens = enc.patch_embed(x)  # [B, N, E] without CLS
        tokens = tokens + enc.pos_embed[:, 1:, :].astype(tokens.dtype)

        key = self.make_rng("mask")
        visible, mask, ids_restore = random_masking(tokens, mask_ratio, key)

        cls = (enc.cls_token + enc.pos_embed[:, :1, :]).astype(visible.dtype)
        cls = jnp.broadcast_to(cls, (visible.shape[0], 1, enc.embed_dim))
        x = jnp.concatenate([cls, visible], axis=1)
        x = enc.pos_drop(x, deterministic=deterministic)
        # encode = blocks + final norm; routes through the fused block kernel
        # when the visible-token geometry allows (ops/block_fused.py).
        x = enc.encode(x, deterministic=deterministic)
        return x[:, 1:, :], mask, ids_restore  # strip CLS for the decoder

    def forward_decoder(
        self,
        latent: jnp.ndarray,
        ids_restore: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self.decoder(
            latent,
            ids_restore,
            self.decoder_pos_embed,
            deterministic=deterministic,
        )

    def forward_loss(
        self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        return mim_reconstruction_loss(
            imgs, pred, mask, self.patch_size, self.norm_pix_loss
        )

    def __call__(
        self,
        imgs: jnp.ndarray,
        mask_ratio: float | None = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if mask_ratio is None:
            mask_ratio = self.mask_ratio
        latent, mask, ids_restore = self.forward_encoder(
            imgs, mask_ratio, deterministic
        )
        pred = self.forward_decoder(latent, ids_restore, deterministic)
        loss = self.forward_loss(imgs, pred, mask)
        return loss, pred, mask

    def reconstruct(self, pred: jnp.ndarray) -> jnp.ndarray:
        """Pixel predictions → images (for visualization)."""
        return unpatchify(
            pred,
            self.patch_size,
            self.encoder.image_size,
            self.encoder.num_channels,
        )
