"""Device→host transfer helpers tuned for high-latency links.

On tunneled/remote TPU attachments each device→host fetch pays a full round
trip (tens of ms), and fetching a **0-d scalar** can hit a pathological slow
path (seconds). Rules encoded here:

- never fetch 0-d arrays directly — reshape to (1,) first (:func:`host_scalar`),
- fetch whole pytrees in O(dtypes) transfers, not O(leaves):
  :func:`fetch_pytree` concatenates same-dtype leaves on device and downloads
  each dtype group as one contiguous array.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["host_scalar", "fetch_pytree"]


@functools.lru_cache(maxsize=None)
def _packer(rep_sharding):
    """One cached jitted flatten-concat per replicated output sharding.

    A fresh ``jax.jit(lambda ...)`` per call would defeat the jit cache and
    re-trace/recompile the all-gather program on every fetch — compiles are
    the expensive resource on the tunneled attachment."""

    def pack(*xs):
        return jnp.concatenate([jnp.reshape(x, (max(1, x.size),)) for x in xs])

    return jax.jit(pack, out_shardings=rep_sharding)


def host_scalar(x) -> float:
    """Fetch a device scalar without touching the 0-d slow path."""
    if isinstance(x, (int, float)):
        return float(x)
    arr = jnp.reshape(x, (1,))
    return float(np.asarray(arr)[0])


def _is_device_array(x: Any) -> bool:
    return isinstance(x, jax.Array)


def _pack_sharded_group(leaves: list, idxs: list[int], out: list) -> None:
    """All-gather + concatenate same-sharding/same-dtype mesh leaves on
    device, then download the group as ONE contiguous array.

    The shardings are homogeneous within the group, so the jitted
    concatenate lowers to one clean all-gather program (heterogeneous
    shardings are what made ad-hoc out-of-jit concats abort on virtual CPU
    meshes — those stay on the per-leaf path).
    """
    mesh = leaves[idxs[0]].sharding.mesh
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    group = [leaves[i] for i in idxs]
    packed = np.asarray(_packer(rep)(*group))  # one fetch
    offset = 0
    for i, leaf in zip(idxs, group):
        size = max(1, leaf.size)
        chunk = packed[offset : offset + size]
        out[i] = np.asarray(chunk[: leaf.size]).reshape(leaf.shape)
        offset += size


def fetch_pytree(tree: Any) -> Any:
    """Copy a pytree to host numpy using one transfer per dtype group.

    Single-device leaves are packed per dtype. Mesh-sharded leaves are
    packed per (sharding, dtype) group — homogeneous shardings concatenate
    into one replicated buffer on device (one all-gather, one download);
    leaves whose sharding is unique in the tree fall back to per-leaf
    ``jax.device_get``.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    device_idx = []
    sharded_groups: dict[Any, list[int]] = {}
    for i, leaf in enumerate(leaves):
        if not _is_device_array(leaf):
            continue
        if len(leaf.sharding.device_set) > 1:
            sharded_groups.setdefault((leaf.sharding, leaf.dtype), []).append(i)
        else:
            device_idx.append(i)
    for (_, _), idxs in sharded_groups.items():
        if len(idxs) > 1:
            _pack_sharded_group(leaves, idxs, leaves)
            continue
        leaf = leaves[idxs[0]]
        if leaf.ndim == 0:
            # Never fetch a 0-d array (pathological slow path on tunneled
            # attachments); 0-d leaves are always replicated, so the
            # reshape is free.
            leaves[idxs[0]] = np.asarray(
                jax.device_get(jnp.reshape(leaf, (1,)))
            ).reshape(())
        else:
            leaves[idxs[0]] = np.asarray(jax.device_get(leaf))
    if not device_idx:
        return jax.tree_util.tree_unflatten(treedef, leaves)

    by_dtype: dict[Any, list[int]] = {}
    for i in device_idx:
        by_dtype.setdefault(jnp.asarray(leaves[i]).dtype, []).append(i)

    out = list(leaves)
    for dtype, idxs in by_dtype.items():
        flats = [jnp.ravel(leaves[i]) for i in idxs]
        sizes = [f.size for f in flats]
        packed = np.asarray(jnp.concatenate(flats)) if len(flats) > 1 else np.asarray(
            jnp.reshape(flats[0], (max(1, sizes[0]),))
        )
        offset = 0
        for i, size in zip(idxs, sizes):
            chunk = packed[offset : offset + size]
            out[i] = np.asarray(chunk).reshape(np.shape(leaves[i]))
            offset += size
    return jax.tree_util.tree_unflatten(treedef, out)
