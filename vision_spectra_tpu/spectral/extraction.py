"""Weight-matrix extraction from Flax parameter pytrees.

The reference walks ``model.named_modules()`` (reference:
vision_spectra/metrics/extraction.py:18-335); here the model is a pure
parameter pytree, so extraction is a path-filtering pass over the flattened
tree. The produced names and matrix-type taxonomy match the reference so the
spectral artifact schemas line up:

- ``blocks.{i}.attn.qkv.{q,k,v}`` — fused QKV kernel split three ways
- ``blocks.{i}.attn.proj`` — attention output projection (``attn_proj``)
- ``blocks.{i}.mlp.fc1`` / ``fc2`` — MLP up/down (``mlp_up`` / ``mlp_down``)
- ``patch_embed.proj`` — patch embedding, flattened to 2-D

Flax stores Dense kernels as ``[in, out]`` (torch uses ``[out, in]``);
extraction transposes to the reference's ``[out, in]`` orientation so matrix
shapes — and therefore fit windows — are identical. Singular values are
transpose-invariant, so metrics agree either way.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np

__all__ = [
    "WeightInfo",
    "extract_qkv_weights",
    "extract_attention_weights",
    "extract_mlp_weights",
    "extract_patch_embed_weights",
    "extract_all_weights",
    "group_weights_by_layer",
    "group_weights_by_type",
    "group_weights_by_shape",
]

_LAYER_IDX_RE = re.compile(r"(?:blocks|layers?|encoder\.layer)\.(\d+)")


@dataclass
class WeightInfo:
    """An extracted 2-D weight matrix tagged with its role in the network."""

    name: str
    layer_idx: int | None
    matrix_type: str  # 'q' | 'k' | 'v' | 'attn_proj' | 'mlp_up' | 'mlp_down' | 'patch_embed'
    weight: np.ndarray
    shape: tuple[int, ...] = field(default=())

    def __post_init__(self) -> None:
        if not self.shape:
            self.shape = tuple(self.weight.shape)

    def __repr__(self) -> str:
        return (
            f"WeightInfo(name='{self.name}', type='{self.matrix_type}', "
            f"shape={self.shape})"
        )


def _extract_layer_idx(name: str) -> int | None:
    m = _LAYER_IDX_RE.search(name)
    return int(m.group(1)) if m else None


def _canonical_path(path: tuple) -> str:
    """Flatten a jax tree path to a dotted name: blocks_0/attn/qkv -> blocks.0.attn.qkv."""
    parts: list[str] = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", str(p))
        key = str(key)
        # Flax linen can't use '.' in module names; blocks are named blocks_0.
        m = re.fullmatch(r"(blocks|layers)_(\d+)", key)
        if m:
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(key)
    return ".".join(parts)


def _flatten_params(params: Any) -> list[tuple[str, Any]]:
    """Flatten a params pytree to (dotted_name, array) pairs.

    Accepts a raw params dict, a flax variables dict (with a top-level
    'params' collection), or a TrainState-like object with ``.params``.
    Device arrays are kept on device (transposes below are lazy) so the
    batched-SVD path runs without any host round trip; numpy inputs pass
    through unchanged.
    """
    if hasattr(params, "params"):
        params = params.params
    if isinstance(params, dict) and set(params.keys()) == {"params"}:
        params = params["params"]
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, leaf in leaves:
        name = _canonical_path(path)
        out.append((name, leaf))
    return out


def _matches(name: str, layer_patterns: list[str] | None) -> bool:
    if not layer_patterns:
        return True
    return any(pat in name for pat in layer_patterns)


# Unfused Q/K/V leaf names: torch-style projections and flax
# MultiHeadDotProductAttention submodule names. Maps leaf -> matrix_type.
_UNFUSED_QKV_LEAVES = {
    "q_proj": "q",
    "k_proj": "k",
    "v_proj": "v",
    "query": "q",
    "key": "k",
    "value": "v",
}


def extract_qkv_weights(
    params: Any,
    layer_patterns: list[str] | None = None,
) -> list[WeightInfo]:
    """Split each fused QKV kernel into Q / K / V matrices.

    The fused kernel is ``[E, 3E]`` in flax orientation; transposed to
    ``[3E, E]`` and split row-wise into three ``[E, E]`` matrices, exactly as
    the reference splits timm's fused ``qkv.weight`` (extraction.py:55-91).

    Fallback for foreign/imported pytrees with **unfused** projections
    (reference: extraction.py:94-111 handles separate ``q_proj/k_proj/
    v_proj`` modules): kernels named ``q_proj/k_proj/v_proj`` (torch style)
    or ``query/key/value`` (flax ``MultiHeadDotProductAttention``) are
    extracted individually. Flax attention kernels arrive as 3-D
    ``[E, heads, head_dim]``; they are flattened to ``[E, heads·head_dim]``
    before the transpose so the emitted matrix is ``[out, in]`` like the
    fused split.
    """
    weights: list[WeightInfo] = []
    for name, arr in _flatten_params(params):
        if not name.endswith(".kernel"):
            continue
        base = name[: -len(".kernel")]
        leaf = base.split(".")[-1]
        if leaf == "qkv" and arr.ndim == 2:
            if not _matches(base, layer_patterns):
                continue
            fused = arr.T  # [3E, E]
            e = fused.shape[1]
            if fused.shape[0] != 3 * e:
                continue
            idx = _extract_layer_idx(base)
            for j, mtype in enumerate("qkv"):
                weights.append(
                    WeightInfo(
                        name=f"{base}.{mtype}",
                        layer_idx=idx,
                        matrix_type=mtype,
                        weight=fused[j * e : (j + 1) * e],
                    )
                )
        elif leaf in _UNFUSED_QKV_LEAVES and arr.ndim in (2, 3):
            if not _matches(base, layer_patterns):
                continue
            w = arr
            if w.ndim == 3:  # flax MHA: [E, heads, head_dim]
                w = w.reshape(w.shape[0], -1)
            weights.append(
                WeightInfo(
                    name=base,
                    layer_idx=_extract_layer_idx(base),
                    matrix_type=_UNFUSED_QKV_LEAVES[leaf],
                    weight=w.T,
                )
            )
    return weights


def extract_attention_weights(
    params: Any,
    layer_patterns: list[str] | None = None,
) -> list[WeightInfo]:
    """Attention output projections (``attn.proj`` kernels)."""
    weights: list[WeightInfo] = []
    for name, arr in _flatten_params(params):
        if not name.endswith(".proj.kernel") or arr.ndim != 2:
            continue
        base = name[: -len(".kernel")]
        if "attn" not in base.lower() and "attention" not in base.lower():
            continue
        if not _matches(base, layer_patterns):
            continue
        weights.append(
            WeightInfo(
                name=base,
                layer_idx=_extract_layer_idx(base),
                matrix_type="attn_proj",
                weight=arr.T,
            )
        )
    return weights


def extract_mlp_weights(
    params: Any,
    layer_patterns: list[str] | None = None,
) -> list[WeightInfo]:
    """MLP fc1/fc2 kernels, tagged mlp_up / mlp_down."""
    weights: list[WeightInfo] = []
    for name, arr in _flatten_params(params):
        if not name.endswith(".kernel") or arr.ndim != 2:
            continue
        base = name[: -len(".kernel")]
        low = base.lower()
        if "mlp" not in low and "ffn" not in low:
            continue
        if not _matches(base, layer_patterns):
            continue
        leaf = base.split(".")[-1]
        if "fc1" in leaf:
            mtype = "mlp_up"
        elif "fc2" in leaf:
            mtype = "mlp_down"
        else:
            mtype = "mlp"
        weights.append(
            WeightInfo(
                name=base,
                layer_idx=_extract_layer_idx(base),
                matrix_type=mtype,
                weight=arr.T,
            )
        )
    return weights


def extract_patch_embed_weights(params: Any) -> list[WeightInfo]:
    """Patch-embedding kernel, flattened to ``[out, in·h·w]`` if needed."""
    weights: list[WeightInfo] = []
    for name, arr in _flatten_params(params):
        if "patch_embed" not in name.lower() or not name.endswith("kernel"):
            continue
        w = arr
        if w.ndim == 4:  # conv kernel [h, w, in, out] in flax
            w = w.reshape(-1, w.shape[-1])
        if w.ndim != 2:
            continue
        base = name[: -len(".kernel")]
        weights.append(
            WeightInfo(
                name=f"{base}.proj" if not base.endswith("proj") else base,
                layer_idx=None,
                matrix_type="patch_embed",
                weight=w.T,  # [out, in·h·w]
            )
        )
    return weights


def extract_all_weights(
    params: Any,
    layer_patterns: list[str] | None = None,
    include_qkv: bool = True,
    include_proj: bool = True,
    include_mlp: bool = False,
    include_patch_embed: bool = True,
) -> list[WeightInfo]:
    """All selected weight families (reference: extraction.py:245-281)."""
    weights: list[WeightInfo] = []
    if include_qkv:
        weights.extend(extract_qkv_weights(params, layer_patterns))
    if include_proj:
        weights.extend(extract_attention_weights(params, layer_patterns))
    if include_mlp:
        weights.extend(extract_mlp_weights(params, layer_patterns))
    if include_patch_embed:
        weights.extend(extract_patch_embed_weights(params))
    return weights


def group_weights_by_layer(
    weights: list[WeightInfo],
) -> dict[int | None, list[WeightInfo]]:
    grouped: dict[int | None, list[WeightInfo]] = {}
    for w in weights:
        grouped.setdefault(w.layer_idx, []).append(w)
    return grouped


def group_weights_by_type(weights: list[WeightInfo]) -> dict[str, list[WeightInfo]]:
    grouped: dict[str, list[WeightInfo]] = {}
    for w in weights:
        grouped.setdefault(w.matrix_type, []).append(w)
    return grouped


def group_weights_by_shape(
    weights: list[WeightInfo],
) -> dict[tuple[int, ...], list[WeightInfo]]:
    """Group matrices by shape so each group can be SVD'd as one batched call.

    This is the key enabler of the on-device batched-SVD path: all Q/K/V/proj
    matrices of a ViT share [E, E], MLP kernels share [4E, E] / [E, 4E], so a
    whole model's spectra reduce to a handful of batched SVD dispatches.
    """
    grouped: dict[tuple[int, ...], list[WeightInfo]] = {}
    for w in weights:
        grouped.setdefault(tuple(w.shape), []).append(w)
    return grouped
