"""Blockwise (flash) attention Pallas kernel for TPU.

Streaming-softmax attention that never materializes the [N, N] score matrix:
for each query block the kernel walks key/value blocks keeping a running
row-max ``m``, normalizer ``l``, and output accumulator — the standard
flash-attention recurrence, implemented with the Pallas TPU primitives.

At this framework's native sequence lengths (2–197 tokens) plain XLA
attention is faster (everything fits in VMEM anyway); the kernel exists so
attention scales to long sequences without an API change and is enabled by
``use_flash=True`` on the model (ops/attention.py picks it for N ≥ 256).

Reference context: the reference computes attention inside timm /
``nn.MultiheadAttention`` (vision_spectra/models/vit.py:160-168) with no
long-sequence path at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, n_keys: int):
    """One (batch·head, q-block) program: stream K/V blocks through softmax."""
    q = q_ref[...]  # [block_q, d]
    block_q, d = q.shape
    num_kb = pl.cdiv(k_ref.shape[0], block_k)

    def body(kb, carry):
        acc, m, l = carry
        ks = k_ref[pl.ds(kb * block_k, block_k), :]  # [block_k, d]
        vs = v_ref[pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            ks,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [block_q, block_k]
        # Mask keys past the true sequence length (padding to block multiple).
        key_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(key_idx < n_keys, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vs.dtype),
            vs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, H, N, D] tensors (non-causal, no dropout)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape

    pad_n = (-n) % block_q
    if pad_n:
        cfg = [(0, 0), (0, 0), (0, pad_n), (0, 0)]
        q = jnp.pad(q, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
    n_padded = n + pad_n

    qf = q.reshape(b * h, n_padded, d)
    kf = k.reshape(b * h, n_padded, d)
    vf = v.reshape(b * h, n_padded, d)

    grid = (b * h, n_padded // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, n_keys=n
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, block_q, d), lambda bh, qb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, n_padded, d), lambda bh, qb: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, n_padded, d), lambda bh, qb: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda bh, qb: (bh, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_padded, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n_padded, d)[:, :, :n, :]
