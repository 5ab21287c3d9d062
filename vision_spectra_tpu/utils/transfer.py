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

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["host_scalar", "fetch_pytree"]


def host_scalar(x) -> float:
    """Fetch a device scalar without touching the 0-d slow path."""
    if isinstance(x, (int, float)):
        return float(x)
    arr = jnp.reshape(x, (1,))
    return float(np.asarray(arr)[0])


def _is_device_array(x: Any) -> bool:
    return isinstance(x, jax.Array)


def fetch_pytree(tree: Any) -> Any:
    """Copy a pytree to host numpy using one transfer per dtype group.

    Arrays sharded across more than one device are fetched per-leaf via
    ``jax.device_get`` instead: concatenating leaves with heterogeneous
    shardings outside jit forces ad-hoc XLA reshard programs (observed to
    abort sporadically on virtual CPU meshes), and on a multi-chip mesh the
    fetch is per-shard anyway, so packing buys nothing there.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    device_idx = []
    for i, leaf in enumerate(leaves):
        if not _is_device_array(leaf):
            continue
        if len(leaf.sharding.device_set) > 1:
            if leaf.ndim == 0:
                # Never fetch a 0-d array (pathological slow path on
                # tunneled attachments); 0-d leaves are always replicated,
                # so the reshape is free.
                leaves[i] = np.asarray(
                    jax.device_get(jnp.reshape(leaf, (1,)))
                ).reshape(())
            else:
                leaves[i] = np.asarray(jax.device_get(leaf))
        else:
            device_idx.append(i)
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
