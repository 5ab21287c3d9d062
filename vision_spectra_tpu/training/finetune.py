"""Finetuning trainer: pretrained encoder + fresh head.

Reference behavior: vision_spectra/training/finetune.py:22-155:

- load a pretrained checkpoint before training, dropping classification-head
  keys (head/classifier/fc) and loading the rest non-strictly,
- optional encoder freeze (only the head trains),
- layer-wise learning rate: encoder parameters train at
  ``base_lr · encoder_lr_scale`` (default 0.1).

Here the last two are one mechanism: a per-leaf LR-multiplier pytree applied
inside the jitted step (0.0 = frozen; see training/state.build_lr_mult).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.serialization
import jax

from vision_spectra_tpu.training.classification import ClassificationTrainer
from vision_spectra_tpu.training.state import build_lr_mult
from vision_spectra_tpu.utils.checkpointing import load_checkpoint
from vision_spectra_tpu.utils.logging import logger

HEAD_KEY_MARKERS = ("head", "classifier", "fc")


def _is_head_path(path_name: str) -> bool:
    parts = path_name.split(".")
    return any(marker in parts for marker in HEAD_KEY_MARKERS)


def load_pretrained_params(
    current_params: Any, checkpoint_path: Path | str
) -> tuple[Any, list[str], list[str]]:
    """Merge pretrained params into ``current_params``, skipping head keys.

    Returns (merged_params, loaded_names, skipped_names). Non-strict: keys
    missing from the checkpoint or with mismatched shapes keep their fresh
    initialization (reference: finetune.py:72-100).
    """
    ckpt = load_checkpoint(checkpoint_path)
    raw = ckpt["state"].get("params", ckpt["state"])
    flat_current = flax.serialization.to_state_dict(current_params)
    # MIM/multitask checkpoints nest the ViT under an 'encoder' scope; when
    # finetuning a bare ViT, unwrap it so the weights actually transfer.
    # (The reference silently loads nothing in this case — finetune.py:81-98
    # copies keys verbatim and strict=False swallows the mismatch; fixed here.)
    if (
        isinstance(raw, dict)
        and "encoder" in raw
        and "encoder" not in flat_current
    ):
        raw = raw["encoder"]

    loaded: list[str] = []
    skipped: list[str] = []

    def merge(cur: dict, pre: dict, prefix: str = "") -> dict:
        out = {}
        for key, val in cur.items():
            name = f"{prefix}.{key}" if prefix else key
            if isinstance(val, dict):
                out[key] = merge(val, pre.get(key, {}) if isinstance(pre, dict) else {}, name)
            else:
                pre_val = pre.get(key) if isinstance(pre, dict) else None
                if (
                    pre_val is not None
                    and not _is_head_path(name)
                    and getattr(pre_val, "shape", None) == val.shape
                ):
                    out[key] = pre_val
                    loaded.append(name)
                else:
                    out[key] = val
                    skipped.append(name)
        return out

    merged = merge(flat_current, raw)
    params = flax.serialization.from_state_dict(current_params, merged)
    logger.info(
        "Loaded %d pretrained tensors, kept %d fresh (head/missing/mismatch)",
        len(loaded),
        len(skipped),
    )
    return params, loaded, skipped


class FinetuneTrainer(ClassificationTrainer):
    def __init__(
        self,
        *args,
        pretrained_checkpoint: Path | str | None = None,
        freeze_encoder: bool = False,
        encoder_lr_scale: float = 0.1,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.freeze_encoder = freeze_encoder
        self.encoder_lr_scale = encoder_lr_scale

        if pretrained_checkpoint is not None:
            params, _, _ = load_pretrained_params(
                self.state.params, pretrained_checkpoint
            )
            # Fresh optimizer state for the merged params.
            self.state = self.state.replace(
                params=params, opt_state=self.tx.init(params)
            )

        # Layer-wise LR: head at base LR, everything else scaled (or frozen).
        encoder_mult = 0.0 if freeze_encoder else encoder_lr_scale
        self.lr_mult = build_lr_mult(
            self.state.params,
            rules=[("head", 1.0)],
            default=encoder_mult,
        )
        n_frozen = sum(
            int(m == 0.0) for m in jax.tree.leaves(self.lr_mult)
        )
        if freeze_encoder:
            logger.info("Encoder frozen: %d tensors at lr multiplier 0", n_frozen)
        else:
            logger.info("Encoder LR scale: %.3g", encoder_lr_scale)
