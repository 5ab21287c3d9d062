"""Hybrid split transformer block for mid-N geometries (experiment).

``VST_P4_HYBRID=1`` replaces the monolithic fused block (ops/block_fused.py)
at 2 < N <= 128 with a three-stage pipeline:

1. **Stage A (Pallas, row-tiled)**: LN1 + the three QKV projections, each
   row tile entirely in VMEM; emits q/k/v as [rows, E] bf16 to HBM.
2. **Attention (XLA)**: head-batched ``mha`` on [B, H, N, d] — XLA lays the
   N x N dots out natively instead of the monolithic kernel's k·heads
   unrolled [N, N] dots inside a row tile (whose operands at N=50 are
   sublane-misaligned 50-row slices).
3. **Stage B (Pallas, row-tiled)**: out-proj + residual + LN2 + MLP(GELU)
   + residual, again one VMEM round trip.

The hybrid pays HBM round trips for q/k/v and the attention output
(~1.9 GB/block fwd at the patch-4 flagship batch) to buy back MXU
efficiency on the attention dots. Whether that trade wins is measured, not
assumed — results/bench_p4_breakdown.py compares it against the monolithic
kernel's mid-N modes; the loser stays env-gated as the record of the
experiment (same policy as VST_MIDN_BATCHED).

Both Pallas stages carry custom VJPs with flash-style recompute (the only
residuals are the stage inputs) and accumulate weight gradients across the
sequentially-executed row grid, exactly like the monolithic kernel.
Numerics: f32 LN/softmax statistics, bf16 matmul operands with f32
accumulation — the same precision class as the XLA block path (the bf16
q/k/v round trip through HBM adds one bf16 rounding that the monolithic
kernel does not have; parity tests budget for it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vision_spectra_tpu.ops.block_fused import (
    _dgelu,
    _gelu,
    _gelu_t,
    _ln_bwd,
    _ln_fwd,
    _mm,
    _mm_grad,
    _mm_t,
)

__all__ = ["hybrid_vit_block", "HYBRID_TILE_ROWS"]

HYBRID_TILE_ROWS = 512


def _tile(rows: int) -> int:
    """Largest 16-aligned divisor of ``rows`` up to HYBRID_TILE_ROWS."""
    import os

    cap = int(os.environ.get("VST_HYBRID_TILE_ROWS", "") or HYBRID_TILE_ROWS)
    cap = min(cap, rows)
    for t in range(cap - cap % 16, 0, -16):
        if rows % t == 0:
            return t
    return rows


# ---------------------------------------------------------------------------
# Stage A: LN1 + QKV   (params: ln1s, ln1b, wq, bq, wk, bk, wv, bv)
# ---------------------------------------------------------------------------

_A_WEIGHT_IDX = (2, 4, 6)


def _a_shapes(e: int):
    ve, ee = (1, e), (e, e)
    return [ve, ve, ee, ve, ee, ve, ee, ve]


def _a_load(refs):
    return tuple(
        r[...] if i in _A_WEIGHT_IDX else r[...].astype(jnp.float32)
        for i, r in enumerate(refs)
    )


def _make_a_fwd(e, out_dtype):
    def kernel(x_ref, *refs):
        param_refs = refs[:8]
        q_ref, k_ref, v_ref = refs[8:]
        x = x_ref[...].astype(jnp.float32)
        ln1s, ln1b, wq, bq, wk, bk, wv, bv = _a_load(param_refs)
        y1 = _ln_fwd(x, ln1s, ln1b)
        q_ref[...] = (_mm(y1, wq) + bq).astype(out_dtype)
        k_ref[...] = (_mm(y1, wk) + bk).astype(out_dtype)
        v_ref[...] = (_mm(y1, wv) + bv).astype(out_dtype)

    return kernel


def _make_a_bwd(e, x_dtype):
    def kernel(x_ref, *refs):
        param_refs = refs[:8]
        dq_ref, dk_ref, dv_ref = refs[8:11]
        dx_ref = refs[11]
        grad_refs = refs[12:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        x = x_ref[...].astype(jnp.float32)
        ln1s, ln1b, wq, bq, wk, bk, wv, bv = _a_load(param_refs)
        y1 = _ln_fwd(x, ln1s, ln1b)
        dq = dq_ref[...].astype(jnp.float32)
        dk = dk_ref[...].astype(jnp.float32)
        dv = dv_ref[...].astype(jnp.float32)
        dy1 = _mm_t(dq, wq) + _mm_t(dk, wk) + _mm_t(dv, wv)
        dwq = _mm_grad(y1, dq)
        dbq = jnp.sum(dq, axis=0, keepdims=True)
        dwk = _mm_grad(y1, dk)
        dbk = jnp.sum(dk, axis=0, keepdims=True)
        dwv = _mm_grad(y1, dv)
        dbv = jnp.sum(dv, axis=0, keepdims=True)
        dx, ds1, dbe1 = _ln_bwd(dy1, x, ln1s)
        dx_ref[...] = dx.astype(x_dtype)
        grads = (ds1, dbe1, dwq, dbq, dwk, dbk, dwv, dbv)
        for r, g in zip(grad_refs, grads):
            r[...] += g

    return kernel


def _param_specs(shapes):
    return [pl.BlockSpec(s, lambda i, _n=len(s): (0,) * _n) for s in shapes]


@functools.lru_cache(maxsize=None)
def _build_a_fwd(rows, e, tile, dtype_name, interpret):
    out_dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        _make_a_fwd(e, out_dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(_a_shapes(e)),
        ],
        out_specs=[pl.BlockSpec((tile, e), lambda i: (i, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, e), out_dtype)] * 3,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_a_bwd(rows, e, tile, dtype_name, interpret):
    x_dtype = jnp.dtype(dtype_name)
    shapes = _a_shapes(e)
    return pl.pallas_call(
        _make_a_bwd(e, x_dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(shapes),
            *[pl.BlockSpec((tile, e), lambda i: (i, 0))] * 3,
        ],
        out_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(shapes),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, e), x_dtype),
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes],
        ],
        interpret=interpret,
    )


def _cast_a(params):
    return tuple(
        p.astype(jnp.bfloat16) if i in _A_WEIGHT_IDX else p
        for i, p in enumerate(params)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stage_a(interpret, x, params):
    rows, e = x.shape
    call = _build_a_fwd(rows, e, _tile(rows), x.dtype.name, interpret)
    return tuple(call(x, *_cast_a(params)))


def _stage_a_fwd(interpret, x, params):
    return _stage_a(interpret, x, params), (x, params)


def _stage_a_bwd(interpret, res, cot):
    x, params = res
    dq, dk, dv = cot
    rows, e = x.shape
    call = _build_a_bwd(rows, e, _tile(rows), x.dtype.name, interpret)
    out = call(x, *_cast_a(params), dq.astype(x.dtype), dk.astype(x.dtype),
               dv.astype(x.dtype))
    dx = out[0]
    dparams = tuple(
        g.astype(p.dtype).reshape(p.shape) for g, p in zip(out[1:], params)
    )
    return dx, dparams


_stage_a.defvjp(_stage_a_fwd, _stage_a_bwd)


# ---------------------------------------------------------------------------
# Stage B: proj + residual + LN2 + MLP + residual
# (params: wp, bp, ln2s, ln2b, w1, b1, w2, b2)
# ---------------------------------------------------------------------------

_B_WEIGHT_IDX = (0, 4, 6)


def _b_shapes(e: int, f: int):
    ve, ee, vf = (1, e), (e, e), (1, f)
    return [ee, ve, ve, ve, (e, f), vf, (f, e), ve]


def _b_load(refs):
    return tuple(
        r[...] if i in _B_WEIGHT_IDX else r[...].astype(jnp.float32)
        for i, r in enumerate(refs)
    )


def _b_fwd_trace(x, ao, params, m1, m2):
    wp, bp, ln2s, ln2b, w1, b1, w2, b2 = params
    p = _mm(ao, wp) + bp
    x_mid = x + m1 * p
    y2 = _ln_fwd(x_mid, ln2s, ln2b)
    u = _mm(y2, w1) + b1
    tg = _gelu_t(u)
    h = _gelu(u, tg)
    o = _mm(h, w2) + b2
    x_out = x_mid + m2 * o
    return dict(x_mid=x_mid, y2=y2, u=u, tg=tg, h=h, x_out=x_out)


def _make_b_fwd(e, f, out_dtype):
    def kernel(x_ref, ao_ref, *refs):
        param_refs = refs[:8]
        m1_ref, m2_ref, o_ref = refs[8:]
        x = x_ref[...].astype(jnp.float32)
        ao = ao_ref[...].astype(jnp.float32)
        t = _b_fwd_trace(x, ao, _b_load(param_refs), m1_ref[...], m2_ref[...])
        o_ref[...] = t["x_out"].astype(out_dtype)

    return kernel


def _make_b_bwd(e, f, x_dtype):
    def kernel(x_ref, ao_ref, *refs):
        param_refs = refs[:8]
        m1_ref, m2_ref, dy_ref = refs[8:11]
        dx_ref, dao_ref = refs[11:13]
        grad_refs = refs[13:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        x = x_ref[...].astype(jnp.float32)
        ao = ao_ref[...].astype(jnp.float32)
        params = _b_load(param_refs)
        wp, bp, ln2s, ln2b, w1, b1, w2, b2 = params
        m1 = m1_ref[...]
        m2 = m2_ref[...]
        t = _b_fwd_trace(x, ao, params, m1, m2)
        dy = dy_ref[...].astype(jnp.float32)

        do = dy * m2
        dh = _mm_t(do, w2)
        dw2 = _mm_grad(t["h"], do)
        db2 = jnp.sum(do, axis=0, keepdims=True)
        du = dh * _dgelu(t["u"], t["tg"])
        dy2 = _mm_t(du, w1)
        dw1 = _mm_grad(t["y2"], du)
        db1 = jnp.sum(du, axis=0, keepdims=True)
        dx_ln2, ds2, dbe2 = _ln_bwd(dy2, t["x_mid"], ln2s)
        dxm = dy + dx_ln2

        dp = dxm * m1
        dao = _mm_t(dp, wp)
        dwp = _mm_grad(ao, dp)
        dbp = jnp.sum(dp, axis=0, keepdims=True)

        dx_ref[...] = dxm.astype(x_dtype)
        dao_ref[...] = dao.astype(x_dtype)
        grads = (dwp, dbp, ds2, dbe2, dw1, db1, dw2, db2)
        for r, g in zip(grad_refs, grads):
            r[...] += g

    return kernel


@functools.lru_cache(maxsize=None)
def _build_b_fwd(rows, e, f, tile, dtype_name, interpret):
    out_dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        _make_b_fwd(e, f, out_dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(_b_shapes(e, f)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, e), out_dtype),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_b_bwd(rows, e, f, tile, dtype_name, interpret):
    x_dtype = jnp.dtype(dtype_name)
    shapes = _b_shapes(e, f)
    return pl.pallas_call(
        _make_b_bwd(e, f, x_dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(shapes),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(shapes),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, e), x_dtype),
            jax.ShapeDtypeStruct((rows, e), x_dtype),
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes],
        ],
        interpret=interpret,
    )


def _cast_b(params):
    return tuple(
        p.astype(jnp.bfloat16) if i in _B_WEIGHT_IDX else p
        for i, p in enumerate(params)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stage_b(interpret, x, ao, params, m1, m2):
    rows, e = x.shape
    f = params[4].shape[1]
    call = _build_b_fwd(rows, e, f, _tile(rows), x.dtype.name, interpret)
    return call(x, ao, *_cast_b(params), m1, m2)


def _stage_b_fwd(interpret, x, ao, params, m1, m2):
    return _stage_b(interpret, x, ao, params, m1, m2), (x, ao, params, m1, m2)


def _stage_b_bwd(interpret, res, dy):
    x, ao, params, m1, m2 = res
    rows, e = x.shape
    f = params[4].shape[1]
    call = _build_b_bwd(rows, e, f, _tile(rows), x.dtype.name, interpret)
    out = call(x, ao, *_cast_b(params), m1, m2, dy.astype(x.dtype))
    dx, dao = out[0], out[1]
    dparams = tuple(
        g.astype(p.dtype).reshape(p.shape) for g, p in zip(out[2:], params)
    )
    return dx, dao, dparams, jnp.zeros_like(m1), jnp.zeros_like(m2)


_stage_b.defvjp(_stage_b_fwd, _stage_b_bwd)


# ---------------------------------------------------------------------------
# Glue
# ---------------------------------------------------------------------------


def hybrid_vit_block(
    x: jnp.ndarray,
    params: tuple,
    m1: jnp.ndarray,
    m2: jnp.ndarray,
    *,
    num_heads: int,
    n_tokens: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``fused_vit_block`` at 2 < N <= 128.

    Same [rows, E] layout and 16-tuple param contract; attention runs as a
    head-batched XLA ``mha`` between the two Pallas stages.
    """
    from vision_spectra_tpu.ops.attention import mha

    rows, e = x.shape
    b = rows // n_tokens
    d = e // num_heads
    q, k, v = _stage_a(interpret, x, tuple(params[:8]))

    def heads(t):
        return t.reshape(b, n_tokens, num_heads, d).transpose(0, 2, 1, 3)

    ao = mha(heads(q), heads(k), heads(v), use_flash=False)
    ao = ao.transpose(0, 2, 1, 3).reshape(rows, e)
    return _stage_b(interpret, x, ao, tuple(params[8:]), m1, m2)
