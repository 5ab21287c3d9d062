"""Alternative mid-N attention formulations for the fused block (quarantined).

Both are measured losers against the unrolled per-image default
(``ops/block_fused._attn_fwd_per_image``); numbers in results/RESULTS.md and
the round-3 sweep (results/bench_midn.py). They remain env-selectable for
A/B reproduction:

- ``VST_MIDN_MASKED=1`` — whole-tile block-diagonal masked [T, T] scores:
  factor-k wasted FLOPs on the attention term, but no per-image unrolling.
- ``VST_MIDN_BATCHED=1`` — per-image attention via one batched 3-D dot per
  head: at N=50 Mosaic lowers the batched dot + [k, n, d] reshapes to
  22.2k img/s vs the unroll's 36.3k, and several configs fail to compile.

These functions are called from inside the Pallas kernel trace of
``ops/block_fused`` (lazy import there keeps this module off the default
import path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vision_spectra_tpu.ops.block_fused import _block_mask, _softmax_rows

__all__ = [
    "attn_fwd_general",
    "attn_bwd_general",
    "attn_fwd_per_image_batched",
    "attn_bwd_per_image_batched",
]


def attn_fwd_general(q, k, v, n, heads, scale):
    """Block-diagonal masked attention for 2 < N <= 128 tokens.

    The tile holds k whole images; per head, full [T, T] scores are computed
    on the MXU and cross-image pairs are masked out — a factor-k FLOP
    overhead on the (small) attention term in exchange for keeping the
    native [rows, E] layout with no head transposes.

    Returns ``(out, ps)`` with ``ps`` the per-head probability matrices —
    the backward kernel recomputes this forward per tile anyway (flash
    style), so handing ``ps`` to :func:`attn_bwd_general` saves it a
    second round of score matmuls + softmaxes.
    """
    t, e = q.shape
    d = e // heads
    neg = _block_mask(t, n)
    outs = []
    ps = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl].astype(jnp.bfloat16), k[:, sl].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + neg
        p = _softmax_rows(s)
        ps.append(p)
        outs.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v[:, sl].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    return jnp.concatenate(outs, axis=1), ps


def attn_bwd_general(dao, q, k, v, ps, heads, scale):
    """Backward of :func:`attn_fwd_general` given its per-head probs."""
    t, e = q.shape
    d = e // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        doh = dao[:, sl]
        p = ps[h]
        pb = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            pb, doh.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dsb = ds.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            dsb, kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            dsb, qh.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    return (jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
            jnp.concatenate(dvs, axis=1))


def attn_fwd_per_image_batched(q, k, v, n, heads, scale):
    """Per-image attention via ONE batched 3-D dot per head ("imgb" mode).

    Same math as ``block_fused._attn_fwd_per_image``, but the k images in
    the tile ride a leading batch dimension of a single ``dot_general``
    instead of k unrolled tiny dots; ``ps`` is a [heads] list of [k, N, N]
    probability arrays consumed by :func:`attn_bwd_per_image_batched`.
    Whether this wins is a Mosaic lowering question — measured, not assumed
    (results/bench_midn.py): it loses.
    """
    t, e = q.shape
    kimg = t // n
    d = e // heads
    outs, ps = [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qb = q[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        kb = k[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        vb = v[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        s = jax.lax.dot_general(
            qb, kb, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [k, n, n]
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        ps.append(p)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [k, n, d]
        outs.append(o.reshape(t, d))
    return jnp.concatenate(outs, axis=1), ps


def attn_bwd_per_image_batched(dao, q, k, v, ps, n, heads, scale):
    """Backward of :func:`attn_fwd_per_image_batched` given its probs."""
    t, e = q.shape
    kimg = t // n
    d = e // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qb = q[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        kb = k[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        vb = v[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        dob = dao[:, sl].astype(jnp.bfloat16).reshape(kimg, n, d)
        p = ps[h]  # [k, n, n] f32
        pb = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(  # P^T @ dO per image
            pb, dob, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [k, n, d]
        dp = jax.lax.dot_general(  # dO @ V^T per image
            dob, vb, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [k, n, n]
        ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
        dsb = ds.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            dsb, kb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [k, n, d]
        dk = jax.lax.dot_general(  # dS^T @ Q per image
            dsb, qb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq.reshape(t, d))
        dks.append(dk.reshape(t, d))
        dvs.append(dv.reshape(t, d))
    return (jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
            jnp.concatenate(dvs, axis=1))
