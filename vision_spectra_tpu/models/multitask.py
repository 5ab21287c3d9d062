"""Multitask ViT: shared encoder for classification + masked image modeling.

Reference behavior: vision_spectra/models/multitask.py:16-247. Three forward
modes dispatched by ``mode``:

- ``classification``: full image → CLS logits,
- ``mim``: masked encoding → reconstruction (loss, pred, mask),
- ``multitask``: classification on the full image AND MIM on a masked
  encoding in the same step (multitask.py:138-169), returning
  ``(logits, mim_loss, pred, mask)``.

Unlike the reference — which duplicates the masking/patchify/loss logic from
MIMModel — this module composes the shared pure functions from models/mim.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vision_spectra_tpu.models.mim import (
    MIMDecoder,
    mim_reconstruction_loss,
    random_masking,
)
from vision_spectra_tpu.models.vit import ViTClassifier


class MultitaskViT(nn.Module):
    """Shared ViT encoder with classification head + MIM decoder."""

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

    def forward_classification(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Full-image classification logits (multitask.py:95-105)."""
        return self.encoder(x, deterministic=deterministic)

    def _masked_encode(self, x: jnp.ndarray, mask_ratio: float, deterministic: bool):
        enc = self.encoder
        tokens = enc.patch_embed(x)
        tokens = tokens + enc.pos_embed[:, 1:, :].astype(tokens.dtype)
        key = self.make_rng("mask")
        visible, mask, ids_restore = random_masking(tokens, mask_ratio, key)
        cls = (enc.cls_token + enc.pos_embed[:, :1, :]).astype(visible.dtype)
        cls = jnp.broadcast_to(cls, (visible.shape[0], 1, enc.embed_dim))
        h = jnp.concatenate([cls, visible], axis=1)
        h = enc.pos_drop(h, deterministic=deterministic)
        # encode = blocks + final norm (fused block kernel when applicable).
        h = enc.encode(h, deterministic=deterministic)
        return h[:, 1:, :], mask, ids_restore

    def forward_mim(
        self,
        x: jnp.ndarray,
        mask_ratio: float | None = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """MIM-only forward (multitask.py:107-136)."""
        if mask_ratio is None:
            mask_ratio = self.mask_ratio
        latent, mask, ids_restore = self._masked_encode(x, mask_ratio, deterministic)
        pred = self.decoder(
            latent, ids_restore, self.decoder_pos_embed, deterministic=deterministic
        )
        loss = mim_reconstruction_loss(
            x, pred, mask, self.encoder.patch_size, self.norm_pix_loss
        )
        return loss, pred, mask

    def forward_multitask(
        self,
        x: jnp.ndarray,
        mask_ratio: float | None = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Classification + MIM in one step (multitask.py:138-169)."""
        logits = self.forward_classification(x, deterministic)
        mim_loss, pred, mask = self.forward_mim(x, mask_ratio, deterministic)
        return logits, mim_loss, pred, mask

    def __call__(
        self,
        x: jnp.ndarray,
        mode: str = "multitask",
        mask_ratio: float | None = None,
        deterministic: bool = True,
    ):
        """Mode dispatch (multitask.py:223-247)."""
        if mode == "classification":
            return self.forward_classification(x, deterministic)
        if mode == "mim":
            return self.forward_mim(x, mask_ratio, deterministic)
        if mode == "multitask":
            return self.forward_multitask(x, mask_ratio, deterministic)
        raise ValueError(f"Unknown mode: {mode}")
