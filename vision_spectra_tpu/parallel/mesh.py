"""Device mesh + sharding rules (data parallel × tensor parallel).

The reference is strictly single-device (reference:
vision_spectra/settings.py:246-254; no torch.distributed anywhere). Here
parallelism is mesh-native from day one:

- a 2-D ``Mesh`` with axes ``("data", "model")`` over all local devices,
- batches sharded over ``data``; parameters replicated over ``data``,
- Megatron-style tensor parallelism over ``model`` when ``model_axis > 1``:
  fused QKV and MLP fc1 kernels split on their output dim, attention proj and
  fc2 on their input dim — XLA's GSPMD propagates the activation shardings
  and inserts the reduce-scatter/all-reduce collectives over ICI,
- everything else (cls token, pos embed, norms, head) replicated.

The models here are ≤6M params, so DP is the throughput path; the TP rules
exist so the same pjit program scales to wider models without API changes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data_axis=-1`` consumes all devices not used by ``model_axis``.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_axis < 1 or n % model_axis != 0:
        raise ValueError(f"model_axis={model_axis} must divide device count {n}")
    data = n // model_axis if data_axis == -1 else data_axis
    if data * model_axis != n:
        raise ValueError(
            f"data_axis*model_axis = {data}*{model_axis} != device count {n}"
        )
    dev_array = np.asarray(devices).reshape(data, model_axis)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def _param_pspec(path: tuple, leaf: Any, tp: bool) -> P:
    """Partition spec for one parameter leaf."""
    if not tp or getattr(leaf, "ndim", 0) != 2:
        return P()
    name = ".".join(str(getattr(p, "key", p)) for p in path)
    # Column-parallel (shard output dim): fused QKV, MLP up-projection.
    if name.endswith("qkv.kernel") or name.endswith("fc1.kernel"):
        return P(None, MODEL_AXIS)
    # Row-parallel (shard input dim): attention out-proj, MLP down-projection.
    if name.endswith("fc2.kernel") or (
        name.endswith("proj.kernel") and ".attn." in name
    ):
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for the parameters (TP rules iff model axis > 1)."""
    tp = mesh.shape[MODEL_AXIS] > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_pspec(path, leaf, tp)), params
    )


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """Shardings for a TrainState: params + optimizer moments share specs."""
    p_shard = param_shardings(mesh, state.params)

    def opt_shard(tree):
        # Optimizer states mirror param structure where shapes match.
        def per_leaf(path, leaf):
            if getattr(leaf, "ndim", 0) == 0:
                return NamedSharding(mesh, P())
            return NamedSharding(mesh, _param_pspec(path, leaf, mesh.shape[MODEL_AXIS] > 1))

        return jax.tree_util.tree_map_with_path(per_leaf, tree)

    return state.replace(
        step=NamedSharding(mesh, P()),
        params=p_shard,
        opt_state=opt_shard(state.opt_state),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def inject_mesh(model: Any, mesh: Mesh) -> Any:
    """Return a copy of ``model`` with the mesh plumbed into kernel dispatch.

    The ViT encoder carries an optional ``mesh`` attribute that lets its
    fused Pallas block kernel run per-shard under ``shard_map`` on
    data-parallel meshes (models/vit.py). Wrapper models (MIM / multitask)
    hold the encoder as a submodule — the clone rebuilds them around a
    mesh-aware encoder. Models without the attribute pass through unchanged.
    """
    if hasattr(model, "mesh") and hasattr(model, "clone"):
        return model.clone(mesh=mesh)
    encoder = getattr(model, "encoder", None)
    if encoder is not None and hasattr(encoder, "mesh"):
        return model.clone(encoder=encoder.clone(mesh=mesh))
    return model


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Place an (unsharded) TrainState onto the mesh."""
    shardings = state_shardings(mesh, state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        state,
        shardings,
        is_leaf=lambda x: x is None,
    )
