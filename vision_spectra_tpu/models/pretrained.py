"""Pretrained-weight import: timm/torch ViT checkpoints → Flax pytrees.

The reference loads pretrained encoders straight from timm's zoo
(``pretrained=True`` — reference: vision_spectra/models/vit.py:64-78,
settings.py:128). This environment has no model zoo or network egress, so the
TPU rebuild imports from a **file**: a torch ``state_dict`` (``.pth``/``.pt``,
as saved by ``torch.save(model.state_dict(), ...)`` for any timm
``vit_*_patch*`` model) or an ``.npz`` with the same key names.

Layout mapping (timm → this package's ViTClassifier, models/vit.py):

====================================  =======================================
timm key                              Flax param (transform)
====================================  =======================================
cls_token [1,1,E]                     cls_token (copy)
pos_embed [1,1+G²,E]                  pos_embed (grid bicubic-resized when the
                                      patch grids differ; CLS row kept)
patch_embed.proj.weight [E,C,p,p]     patch_embed/kernel [p·p·C,E]
                                      (permute O,C,ki,kj → ki,kj,C,O; flatten)
patch_embed.proj.bias [E]             patch_embed/bias
blocks.N.norm1.weight/bias            blocks_N/norm1/scale,bias
blocks.N.attn.qkv.weight [3E,E]       blocks_N/attn/qkv/kernel [E,3E] (Tᵀ;
                                      timm's q;k;v row chunks land on the
                                      fused column layout this model splits)
blocks.N.attn.proj.weight [E,E]       blocks_N/attn/proj/kernel (Tᵀ)
blocks.N.mlp.fc{1,2}.weight           blocks_N/mlp/fc{1,2}/kernel (Tᵀ)
norm.weight/bias                      norm_out/scale,bias
head.weight [K,E] / head.bias         head/kernel [E,K] / head/bias — only
                                      when K matches; otherwise the fresh
                                      head is kept (finetune semantics)
====================================  =======================================

All linear weights transpose torch's [out,in] to Flax's [in,out]. The fused
QKV needs no head-deinterleaving: timm chunks the 3E output dim as q;k;v and
this model's ``reshape(b,n,3,h,d)`` split consumes exactly that order.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from vision_spectra_tpu.utils.logging import logger

__all__ = [
    "load_timm_state_dict",
    "timm_to_flax",
    "import_pretrained",
    "resize_pos_embed",
]


def load_timm_state_dict(path: Path | str) -> dict[str, np.ndarray]:
    """Read a timm ViT ``state_dict`` file into numpy arrays.

    Accepts ``.pth``/``.pt``/``.bin`` (torch serialization; also unwraps the
    common ``{"model": ...}`` / ``{"state_dict": ...}`` checkpoint envelopes)
    and ``.npz`` (same key names).
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"pretrained checkpoint not found: {path}")
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch  # CPU-only torch is available in this environment

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for envelope in ("model", "state_dict", "model_state_dict"):
        if isinstance(obj, dict) and envelope in obj and isinstance(
            obj[envelope], dict
        ):
            obj = obj[envelope]
    if not isinstance(obj, Mapping):
        raise ValueError(
            f"{path} does not contain a state_dict mapping (got {type(obj)})"
        )
    return {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in obj.items()
    }


def resize_pos_embed(
    pos: np.ndarray, num_patches: int, num_prefix: int = 1
) -> np.ndarray:
    """Bicubically resize the patch-grid rows of a [1, P+G², E] pos embed.

    Mirrors timm's ``resample_abs_pos_embed``: the prefix (CLS) rows pass
    through untouched; the grid rows are reshaped to [g, g, E], resized to
    the target grid with bicubic interpolation, and re-flattened.
    """
    total = pos.shape[1]
    src_grid = total - num_prefix
    if src_grid == num_patches:
        return pos
    g_src = int(round(math.sqrt(src_grid)))
    g_dst = int(round(math.sqrt(num_patches)))
    if g_src * g_src != src_grid or g_dst * g_dst != num_patches:
        raise ValueError(
            f"cannot resize pos embed: non-square grids {src_grid}→{num_patches}"
        )
    prefix, grid = pos[:, :num_prefix], pos[:, num_prefix:]
    e = pos.shape[-1]
    grid = grid.reshape(1, g_src, g_src, e)
    grid = np.asarray(
        jax.image.resize(
            jnp.asarray(grid, jnp.float32), (1, g_dst, g_dst, e), method="bicubic"
        )
    )
    return np.concatenate([prefix, grid.reshape(1, g_dst * g_dst, e)], axis=1)


def _t(w: np.ndarray) -> np.ndarray:
    """torch linear weight [out, in] → Flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def timm_to_flax(
    sd: Mapping[str, np.ndarray],
    *,
    depth: int,
    num_patches: int,
) -> dict[str, Any]:
    """Map a timm ViT state dict onto this package's ViTClassifier params.

    Returns a (possibly partial) nested params dict — missing source keys
    are simply absent from the output; :func:`import_pretrained` merges it
    non-strictly into a freshly initialized pytree.
    """
    sd = {k.removeprefix("module.").removeprefix("encoder."): v
          for k, v in sd.items()}
    out: dict[str, Any] = {}

    if "cls_token" in sd:
        out["cls_token"] = np.asarray(sd["cls_token"], np.float32)
    if "pos_embed" in sd:
        out["pos_embed"] = resize_pos_embed(
            np.asarray(sd["pos_embed"], np.float32), num_patches
        )
    if "patch_embed.proj.weight" in sd:
        w = np.asarray(sd["patch_embed.proj.weight"], np.float32)  # [E,C,p,p]
        e = w.shape[0]
        # conv weight → the flatten order PatchEmbed uses: (ki, kj, C) rows.
        kernel = w.transpose(2, 3, 1, 0).reshape(-1, e)
        pe: dict[str, Any] = {"kernel": kernel}
        if "patch_embed.proj.bias" in sd:
            pe["bias"] = np.asarray(sd["patch_embed.proj.bias"], np.float32)
        out["patch_embed"] = pe

    for i in range(depth):
        src = f"blocks.{i}."
        blk: dict[str, Any] = {}

        def ln(name: str) -> dict[str, np.ndarray] | None:
            w, b = sd.get(src + name + ".weight"), sd.get(src + name + ".bias")
            if w is None:
                return None
            d = {"scale": np.asarray(w, np.float32)}
            if b is not None:
                d["bias"] = np.asarray(b, np.float32)
            return d

        def dense(name: str) -> dict[str, np.ndarray] | None:
            w = sd.get(src + name + ".weight")
            if w is None:
                return None
            d = {"kernel": _t(np.asarray(w, np.float32))}
            b = sd.get(src + name + ".bias")
            if b is not None:
                d["bias"] = np.asarray(b, np.float32)
            return d

        for dst_name, maker in (
            ("norm1", ln("norm1")),
            ("norm2", ln("norm2")),
        ):
            if maker is not None:
                blk[dst_name] = maker
        attn = {}
        for dst_name, d in (("qkv", dense("attn.qkv")), ("proj", dense("attn.proj"))):
            if d is not None:
                attn[dst_name] = d
        if attn:
            blk["attn"] = attn
        mlp = {}
        for dst_name, d in (("fc1", dense("mlp.fc1")), ("fc2", dense("mlp.fc2"))):
            if d is not None:
                mlp[dst_name] = d
        if mlp:
            blk["mlp"] = mlp
        if blk:
            out[f"blocks_{i}"] = blk

    if "norm.weight" in sd:
        out["norm_out"] = {"scale": np.asarray(sd["norm.weight"], np.float32)}
        if "norm.bias" in sd:
            out["norm_out"]["bias"] = np.asarray(sd["norm.bias"], np.float32)
    if "head.weight" in sd:
        head = {"kernel": _t(np.asarray(sd["head.weight"], np.float32))}
        if "head.bias" in sd:
            head["bias"] = np.asarray(sd["head.bias"], np.float32)
        out["head"] = head
    return out


def import_pretrained(
    params: Any,
    source: Path | str | Mapping[str, np.ndarray],
    *,
    load_head: bool = False,
) -> tuple[Any, list[str], list[str]]:
    """Merge a timm checkpoint into freshly-initialized ViT params.

    Non-strict (reference finetune semantics, training/finetune.py): tensors
    whose key or shape doesn't line up keep their fresh init. The
    classification head is skipped unless ``load_head=True`` AND the shapes
    match (the reference's zoo loads always re-head to the target classes —
    reference models/vit.py:64-78 passes num_classes to timm.create_model).

    Returns (merged_params, loaded_names, skipped_names).
    """
    import flax.serialization

    sd = (
        dict(source)
        if isinstance(source, Mapping)
        else load_timm_state_dict(source)
    )
    flat = flax.serialization.to_state_dict(params)
    # MIM/multitask trees nest the ViT under an 'encoder' scope.
    target = flat["encoder"] if "encoder" in flat and "cls_token" not in flat else flat
    depth = sum(1 for k in target if str(k).startswith("blocks_"))
    num_patches = int(target["pos_embed"].shape[1]) - 1
    mapped = timm_to_flax(sd, depth=depth, num_patches=num_patches)
    if not load_head:
        mapped.pop("head", None)

    loaded: list[str] = []
    skipped: list[str] = []

    def merge(cur: dict, pre: Mapping, prefix: str = "") -> dict:
        out = {}
        for key, val in cur.items():
            name = f"{prefix}.{key}" if prefix else str(key)
            sub = pre.get(key) if isinstance(pre, Mapping) else None
            if isinstance(val, dict):
                out[key] = merge(val, sub if isinstance(sub, Mapping) else {}, name)
            elif sub is not None and np.shape(sub) == np.shape(val):
                out[key] = np.asarray(sub, np.float32)
                loaded.append(name)
            else:
                out[key] = val
                skipped.append(name)
        return out

    merged_target = merge(target, mapped)
    if target is not flat:
        flat = dict(flat)
        flat["encoder"] = merged_target
    else:
        flat = merged_target
    result = flax.serialization.from_state_dict(params, flat)
    if not loaded:
        raise ValueError(
            "pretrained import matched zero tensors — wrong architecture or "
            "not a timm ViT state dict"
        )
    logger.info(
        "Imported %d pretrained tensors (%d kept fresh init)",
        len(loaded),
        len(skipped),
    )
    return result, loaded, skipped
