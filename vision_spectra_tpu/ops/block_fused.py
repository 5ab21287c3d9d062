"""Whole-transformer-block Pallas TPU kernel (forward + custom-VJP backward).

Why: at this framework's flagship geometry (ViT-Tiny, 28 px / patch 16 → a
2-token sequence of CLS + one patch) the XLA transformer block is
fusion/bandwidth-bound, not MXU-bound: the matmul skeleton of all 12 blocks
runs fwd+bwd in ~5.3 ms at batch 8192 (~99 TFLOPS) while the full XLA step
takes ~17.4 ms — LayerNorms, GELU, residuals, and the tiny-N attention each
round-trip [B·N, E] activations through HBM. This kernel runs ONE block —
LN1 → QKV → pair attention → proj → +residual → LN2 → MLP(GELU) →
+residual — per row-tile entirely in VMEM. All eight weight matrices of a
ViT-Tiny block (~0.9 MB bf16) stay resident across the row grid.

Attention specializations (three, selected by ``select_tile``):

- **Pair attention, N == 2** (every reference scenario A–F: 28 px /
  patch 16 — /root/reference/vision_spectra/experiments/
  run_spectral_analysis.py:244-289): rows are laid out (image-major,
  token-minor) so each image's pair is adjacent. Attention becomes, per
  head, a 2-way softmax between a row and its partner row:

      s_self[r]  = q[r]·k[r] / sqrt(d)
      s_cross[r] = q[r]·k[partner(r)] / sqrt(d)
      out[r] = softmax2(s)·(v[r], v[partner(r)])

  The per-head inner products are computed as elementwise products reduced
  within 64-lane head groups by a block-diagonal ones matrix G (one small
  bf16 MXU matmul with f32 accumulation), keeping every operand in the
  native [rows, E] lane layout — no head-split reshapes or transposes.
  ``partner`` is a ±1 row roll selected by row parity (pairs never straddle
  the even row tile).

- **Mid-N attention, 2 < N <= 128** (patch-4: N = 50; MIM-13 visible
  tokens): tiles hold k whole images (k·N rows; N-dependent row budget —
  512 rows at N >= 32, 256 below, measured in results/bench_midn.py), and
  attention runs per image-group as unrolled block-masked [g·N, g·N]
  softmax dots per head (default g = 2 at N >= 32, 4 below —
  ``_midn_group``, measured in results/bench_p4_breakdown.py; g is the
  alignment/waste trade). Measured-loser alternatives are QUARANTINED in
  ops/experimental/ (lazy-imported only when their env knob is set):
  whole-tile masked [T, T] scores (``VST_MIDN_MASKED=1``), one batched 3-D
  dot (``VST_MIDN_BATCHED=1``), and the split-stage hybrid with XLA
  attention (``VST_P4_HYBRID=1`` — 3.8x slower). Ungrouped per-image
  (``VST_MIDN_GROUP=1``) stays in this module (it is the group-g code at
  g=1).

- **N > 128 stays on the XLA path** (models/vit.py) — above the mid-N
  budget the masked/unrolled formulations lose to XLA's fused attention.

The backward pass recomputes the forward per tile (flash-style — the only
residual is the block input) and accumulates weight gradients across the
sequentially-executed row grid into revisited output blocks. In per-image
mid-N mode the forward instead spills the attention probs (f32) + output
(bf16) to HBM and the backward skips the attention part of the recompute —
the lowest-MXU-efficiency slice of the re-execution traded against HBM
round-trip traffic, measured a ~10% stack win at both shipped geometries
(results/bench_savep.py; ``VST_MIDN_SAVEP=0`` restores the full-recompute
backward, see :func:`_midn_savep` — including its peak-HBM *capacity* cost,
which the spill pays on top of the traffic trade).

Numerics match the XLA block to bf16 tolerance: LN statistics and softmax
in f32 (flax LayerNorm semantics: fast variance, eps 1e-6, f32 stats),
matmuls in bf16 with f32 accumulation, GELU a tanh-form approximant of the
exact erf GELU accurate to 5.9e-6 (~3 orders below bf16). The kernel keeps
the intra-block residual in f32 and rounds once at the block boundary
(the XLA path rounds after each residual add), a strictly tighter rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_vit_block", "kernel_serves", "padded_tokens", "TILE_ROWS"]

TILE_ROWS = 256
_LN_EPS = 1e-6

# params tuple layout (all f32; vectors pre-reshaped to [1, D]):
#   0 ln1_scale [1,E]   1 ln1_bias [1,E]
#   2 wq [E,E]   3 bq [1,E]   4 wk [E,E]  5 bk [1,E]   6 wv [E,E]  7 bv [1,E]
#   8 wp [E,E]   9 bp [1,E]
#  10 ln2_scale [1,E]  11 ln2_bias [1,E]
#  12 w1 [E,F]  13 b1 [1,F]  14 w2 [F,E]  15 b2 [1,E]
N_PARAMS = 16


def _midn_tile_rows(n_tokens: int) -> int:
    """Row budget for mid-N tiles (env override ``VST_MIDN_TILE_ROWS`` for
    measurement sweeps; see results/bench_midn.py). The per-image default
    is N-dependent, both points measured (round 3 sweep): at N=50 the
    512-row budget wins (fewer grid steps, larger matmuls; 36.2k vs 34.8k
    img/s fwd+bwd), at N=13 the 256-row budget wins (k doubles to 32
    images per tile at 512 and the extra unrolled tiny [13, 13] dots cost
    more than the grid steps saved; 104.9k vs 100.2k)."""
    import os

    v = os.environ.get("VST_MIDN_TILE_ROWS", "")
    if v:
        return int(v)
    # The masked path materializes [T, T] scores per head — keep its
    # historical 256-row budget; per-image probs are k x [N, N], flat in k.
    if not _midn_per_image():
        return 256
    return 512 if n_tokens >= 32 else 256


def padded_tokens(n: int) -> int:
    """Sublane-aligned per-image token count for the mid-N path.

    N=50 (patch-4) and N=13 (MIM visible) are sublane-misaligned: every
    per-image/group slice inside the kernel starts at an offset that is not
    a multiple of the 8-row f32 sublane tile, forcing Mosaic relayout
    copies around each attention dot, and the group score matrices pad
    internally anyway ([100,100] -> [104,128] physical). Padding each image
    to the next multiple of 8 tokens (50 -> 56, 13 -> 16) makes every
    slice, score matrix and spill buffer naturally aligned, at the cost of
    n_pad/n extra rows through the non-attention matmuls. MEASURED LOSER
    (results/bench_p4_pad.py, v5e, round 5): the extra rows pass straight
    through — stack +9.5% at N=50 (188.1 -> 206.0 ms) and +10% at N=13
    (57.3 -> 63.0 ms), full step 213.6 -> 230.4 ms — i.e. Mosaic's
    relayout of the misaligned per-image slices was NOT a material cost.
    Kept env-selectable as the record of the experiment.

    Numerics are the SAME MATH for real rows: dummy tokens are masked out
    of every real query's softmax (``_attn_mask``), all other ops are
    row-local, and dummy rows receive zero cotangents (the model slices
    them off before the loss), so they contribute exact zeros to weight
    grads. Bit-level, the softmax row-sum reduces over n_pad vs n columns,
    so identical values can round differently at the ulp level (measured
    ~4e-9 on the probs — tests/test_ops.py TestMidNTokenPadding).

    ``VST_MIDN_PAD=1`` enables; default OFF (the measurement above — pair
    path and already-aligned N are returned unchanged either way).
    """
    import os

    if n <= 2 or n % 8 == 0 or not 2 < n <= 128:
        return n
    if os.environ.get("VST_MIDN_PAD", "0") in ("", "0"):
        return n
    return -(-n // 8) * 8


def select_tile(rows: int, n_tokens: int) -> int | None:
    """Row-tile size for this geometry, or None if the kernel can't serve it.

    N == 2 uses the pair-attention path: the 256-row tile when rows divide
    evenly, otherwise the largest 16-row-aligned even divisor <= 256 — this
    extends the kernel to the science protocol's small batches (32/64 images
    at N = 2 -> 64/128 rows; VERDICT r1 item 8) where the tile is simply the
    whole batch. 16-row alignment keeps bf16/f32 sublane tiling happy;
    even tiles keep CLS/patch pairs from straddling tiles.
    2 < N <= 128 uses per-image attention within the tile: the tile is k·N
    rows for the largest k with k·N <= the mid-N row budget that divides the
    batch, so whole images never straddle tiles.
    """
    if rows % n_tokens:
        return None
    if n_tokens == 2:
        if rows % TILE_ROWS == 0:
            return TILE_ROWS
        cap = min(TILE_ROWS, rows)
        for tile in range(cap - cap % 16, 0, -16):
            if rows % tile == 0:
                return tile
        return None
    if not 2 < n_tokens <= 128:
        return None
    batch = rows // n_tokens
    for k in range(min(_midn_tile_rows(n_tokens) // n_tokens, batch), 0, -1):
        if batch % k == 0:
            return k * n_tokens
    return None


# Largest embed dim the kernel serves: all block weights (bf16) plus their
# f32 gradient accumulators must fit VMEM alongside the activation tile.
# Measured on v5e: 384 (ViT-Small, ~2.95M block params) compiles and runs;
# 768 (ViT-Base, ~7.1M) overflows and fails to compile.
MAX_EMBED_DIM = 384


def kernel_serves(rows: int, n_tokens: int, embed_dim: int = 192) -> bool:
    """Backend-agnostic gate: geometry, embed-dim budget, env kill switch.

    The single source of truth for whether the kernel CAN run a shape;
    callers forcing the kernel (tests, ``use_fused_blocks=True``) check
    only this.
    """
    from vision_spectra_tpu.core.runtime import env_flag

    return (
        not env_flag("VST_NO_FUSED_BLOCK")
        and embed_dim <= MAX_EMBED_DIM
        and select_tile(rows, n_tokens) is not None
    )


# ---------------------------------------------------------------------------
# In-kernel math helpers (operate on f32 register arrays)
# ---------------------------------------------------------------------------


def _ln_fwd(x, scale, bias):
    """flax nn.LayerNorm: fast variance, f32 stats, eps 1e-6."""
    y, _, _ = _ln_fwd_stats(x, scale, bias)
    return y


def _ln_fwd_stats(x, scale, bias):
    """LayerNorm forward returning ``(y, mu, r)`` so the backward kernel
    reuses the statistics its own recompute produced instead of re-reducing
    them inside :func:`_ln_bwd`. Measured a WASH on the stack (186.0 vs
    186.2 ms at N=50; Mosaic already CSE'd the duplicate reductions over
    the same ``x`` within the kernel trace) — kept because the explicit
    dataflow is clearer and robust to the CSE not firing."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    mu2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    r = jax.lax.rsqrt(var + _LN_EPS)
    return (x - mu) * (r * scale) + bias, mu, r


def _ln_bwd(dy, x, scale, mu=None, r=None):
    """Returns (dx, dscale, dbias) for y = LN(x)*scale + bias.

    ``mu``/``r`` accept the forward's statistics (``_ln_fwd_stats``) to
    skip re-reducing them; recomputed from ``x`` when omitted (the
    standalone form ops/experimental/block_hybrid.py uses)."""
    if mu is None or r is None:
        mu = jnp.mean(x, axis=1, keepdims=True)
        mu2 = jnp.mean(x * x, axis=1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mu) * r
    dyn = dy * scale
    m1 = jnp.mean(dyn, axis=1, keepdims=True)
    m2 = jnp.mean(dyn * xhat, axis=1, keepdims=True)
    dx = r * (dyn - m1 - xhat * m2)
    dscale = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dscale, dbias


def _partner(x):
    """Swap adjacent row pairs: row 2i <-> row 2i+1 (any trailing width)."""
    up = jnp.concatenate([x[1:], x[:1]], axis=0)
    dn = jnp.concatenate([x[-1:], x[:-1]], axis=0)
    even = (
        jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) % 2
    ) == 0
    return jnp.where(even, up, dn)


def _group_matrix(e: int, d: int):
    """bf16 [E, E] block-diagonal ones: G[i, j] = (i // d == j // d).

    bf16 holds 0/1 exactly, and a bf16 contraction runs at native MXU rate
    where the earlier f32 form decomposed into multi-pass matmuls —
    measured ~4x on the attention share of the block kernel. The ``prod``
    operand is rounded to bf16 (see :func:`_group_sum`)."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (e, e), 0) // d
    gj = jax.lax.broadcasted_iota(jnp.int32, (e, e), 1) // d
    return (gi == gj).astype(jnp.bfloat16)


def _group_sum(prod, g_mat):
    """Per-head sums of ``prod`` [T, E], broadcast back over head lanes.

    ``prod`` is rounded to bf16 for the contraction (f32 accumulation):
    per-term rounding is 2^-8 relative and the 64-lane head sum stays in
    f32 — the same precision class as the XLA attention path, whose
    q·k scores are bf16-input matmuls with f32 accumulation."""
    return jax.lax.dot_general(
        prod.astype(jnp.bfloat16), g_mat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm(a, w):
    """bf16 matmul with f32 accumulation: [T, I] @ [I, O]."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_t(a, w):
    """bf16 [T, O] @ [I, O]^T -> [T, I], f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_grad(act, cot):
    """Weight grad: act [T, I]^T @ cot [T, O] -> [I, O], f32 accumulation."""
    return jax.lax.dot_general(
        act.astype(jnp.bfloat16), cot.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# GELU as tanh of an odd degree-9 polynomial: gelu(u) = 0.5*u*(1+tanh(g(u)))
# with g fitted to atanh(erf(u/sqrt2)) (iteratively reweighted LS on the
# Phi error). Max |gelu - exact erf-GELU| = 5.9e-6 over [-12, 12], tails
# saturate correctly (poly -> +/-inf, tanh -> +/-1) — the same exactness
# class as the Abramowitz–Stegun erf this replaces (1.5e-7) and ~3 orders
# below bf16 resolution, but it lowers to ONE transcendental (tanh) + 5
# FMAs instead of exp + divide + sign select. Measured on v5e at batch
# 8192: the erf form cost 0.74 ms per 12-block forward above the matmul
# floor; this form hides entirely under the MXU matmuls (tests assert the
# 1e-5 accuracy — tests/test_ops.py::test_gelu_matches_exact).
_G1 = 7.978697129688e-01
_G3 = 3.639228417463e-02
_G5 = -8.782516177129e-05
_G7 = -3.669374625266e-05
_G9 = 1.425024707264e-06


def _gelu_t(u):
    """tanh(g(u)) — the one transcendental, shared by gelu and dgelu."""
    u2 = u * u
    g = u * (_G1 + u2 * (_G3 + u2 * (_G5 + u2 * (_G7 + u2 * _G9))))
    return jnp.tanh(g)


def _gelu(u, t=None):
    """GELU(u) = u * Phi(u); pass a precomputed ``t = _gelu_t(u)`` to share
    the transcendental with :func:`_dgelu` (backward recompute)."""
    if t is None:
        t = _gelu_t(u)
    return 0.5 * u * (1.0 + t)


def _dgelu(u, t=None):
    """d/du of the computed GELU — the exact derivative of the tanh-form
    approximant (gradient consistent with the forward actually used)."""
    if t is None:
        t = _gelu_t(u)
    u2 = u * u
    dg = _G1 + u2 * (3 * _G3 + u2 * (
        5 * _G5 + u2 * (7 * _G7 + u2 * (9 * _G9))))
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * dg


def _attn_fwd(q, k, v, g_mat, scale):
    """Pair attention forward; returns (out, a_self, a_cross, pk, pv)."""
    pk = _partner(k)
    pv = _partner(v)
    s_s = _group_sum(q * k, g_mat) * scale
    s_c = _group_sum(q * pk, g_mat) * scale
    m = jnp.maximum(s_s, s_c)
    es = jnp.exp(s_s - m)
    ec = jnp.exp(s_c - m)
    zi = 1.0 / (es + ec)
    a_s = es * zi
    a_c = ec * zi
    return a_s * v + a_c * pv, a_s, a_c, pk, pv


def _block_mask(t: int, n: int):
    """[T, T] additive mask: 0 within an image's n-token block, -1e9 across."""
    blk_r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) // n
    blk_c = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) // n
    return jnp.where(blk_r == blk_c, 0.0, -1e9)


def _attn_mask(gn: int, n: int, n_real: int):
    """Additive mask for grouped per-image scores: -1e9 across images AND on
    dummy-key columns (token index >= n_real within each n-token image).
    Returns None when no masking is needed (ungrouped, unpadded)."""
    if gn == n and n_real == n:
        return None
    blk_r = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 0) // n
    blk_c = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 1) // n
    ok = blk_r == blk_c
    if n_real < n:
        tok_c = jax.lax.broadcasted_iota(jnp.int32, (gn, gn), 1) % n
        ok = ok & (tok_c < n_real)
    return jnp.where(ok, 0.0, -1e9)


def _softmax_rows(s):
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _midn_mode() -> str:
    """Mid-N attention strategy: ``img`` (per-image dots, the measured
    default), ``imgb`` (per-image via one batched 3-D dot per head —
    ``VST_MIDN_BATCHED=1``; MEASURED LOSER, kept as the record of the
    experiment: at N=50 Mosaic lowers the batched dot + [k, n, d] reshapes
    to 22.2k img/s vs the unroll's 36.3k, and several other configs fail
    to compile outright — round-3 sweep, results/bench_midn.py), or
    ``masked`` ([T, T] scores, ``VST_MIDN_MASKED=1``).

    ``VST_MIDN_ATTNOFF=1`` replaces attention with identity (ao = v, zero
    q/k grads) — a MEASUREMENT-ONLY ablation used by
    results/bench_p4_breakdown.py to attribute the kernel's time between
    attention and the rest of the block; numerically meaningless for
    training.

    Per-image removes the factor-k masked-FLOP overhead of the masked
    formulation (ops/experimental/midn_alternatives.py) AND shrinks the softmax/probability arrays
    from [T, T] to k x [N, N], which is what lets the mid-N row budget grow
    to 512 without blowing VMEM. Knobs exist for results/bench_midn.py."""
    from vision_spectra_tpu.core.runtime import env_flag

    if env_flag("VST_MIDN_ATTNOFF"):
        return "off"
    if env_flag("VST_MIDN_MASKED"):
        return "masked"
    return "imgb" if env_flag("VST_MIDN_BATCHED") else "img"


def _midn_per_image() -> bool:
    return _midn_mode() not in ("masked", "off")


def _midn_group(n_tokens: int) -> int:
    """Images per attention dot in per-image mode (``VST_MIDN_GROUP``
    overrides). Group g > 1 batches g adjacent images into one
    block-masked [g·N, g·N] dot per head: g× wasted score FLOPs in
    exchange for g× fewer, larger, better-aligned MXU ops.

    Defaults are measured, not assumed (results/bench_p4_breakdown.py,
    v5e, batch 8192, 12-block stack fwd+bwd): at N=50 group2 wins
    (206.4 ms vs 223.0 ungrouped; group4 224.4, group8 253.3 — waste
    overtakes alignment), at N=13 group4 wins narrowly (62.4 ms vs 63.6
    group2 vs 66.0 ungrouped — tinier dots leave more fixed overhead to
    amortize). Falls back to ungrouped when the tile's image count is not
    divisible by the group (``_attn_fwd_per_image``)."""
    import os

    v = os.environ.get("VST_MIDN_GROUP", "")
    if v:
        return max(1, int(v))
    return 2 if n_tokens >= 32 else 4


def _qkv_fused() -> bool:
    """``VST_QKV_FUSED=1``: compute Q/K/V (and their input- and
    weight-gradients) as ONE wide dot over a concatenated [E, 3E] weight
    instead of three [E, E] dots. At E = 192 the three narrow dots each pad
    their 192 output lanes to 2 MXU tiles (75% N-utilization); the fused
    576-lane dot pads to 5 tiles (90%) and amortizes per-dot overhead.
    The concatenation is a per-tile VMEM copy (~0.2 MB, off the HBM path).
    MEASURED LOSER (round 5, v5e): stack 186.2 -> 198.3 ms at N=50 and
    flat at N=2 — the per-tile concats cost more than the wider dot buys,
    i.e. Mosaic already tiles the 192-lane dots well (consistent with the
    flagship's ~79% fwd+bwd MFU at E=192). Kept env-selectable as the
    record; default off."""
    import os

    return os.environ.get("VST_QKV_FUSED", "0") not in ("", "0")


def _abl_flags() -> str:
    """MEASUREMENT-ONLY component ablations for the whole-step roofline
    (results/bench_p4_roofline.py): 'g' = GELU -> identity, 'l' =
    LayerNorm -> scale*x+bias (stats skipped), 'w' = weight-grad matmuls +
    accumulation skipped. Read per kernel build and part of the builder
    cache key; numerically meaningless for training — never set these in a
    real run."""
    import os

    out = []
    if os.environ.get("VST_ABL_GELU", ""):
        out.append("g")
    if os.environ.get("VST_ABL_LN", ""):
        out.append("l")
    if os.environ.get("VST_ABL_WGRAD", ""):
        out.append("w")
    if _qkv_fused():
        out.append("Q")  # not an ablation: the fused-QKV dot variant
    return "".join(out)


def _midn_savep() -> str:
    """Spill mode for per-image attention across fwd/bwd (``VST_MIDN_SAVEP``):

    ``"f32"`` (``=1``, the DEFAULT: the forward kernel writes the per-image
    probability matrices to HBM in f32 plus the attention output in bf16,
    and the backward consumes them instead of recomputing scores + softmax
    + P·V), ``"bf16"`` (``=2``: probs stored bf16 — half the spill traffic
    for a bf16 rounding of the probs used by the backward's dS math; the
    f32 mode is numerically identical to recompute because ``_mm`` casts
    its operands to bf16 at use anyway), ``""`` (``=0``: off — the backward
    recomputes the attention forward per tile, flash style).

    Only meaningful in per-image mid-N mode; ignored elsewhere. The spill
    trades ~2x the attention-forward compute (once in fwd, once recomputed
    in bwd) against HBM round-trip traffic for the probs — measured, not
    assumed (results/bench_savep.py, v5e, 12-block stack fwd+bwd): f32
    spill wins at both shipped geometries — 206.9 -> 186.0 ms at N=50
    group2 (-10.1%) and 62.7 -> 56.7 ms at N=13 group4 (-9.6%); bf16
    probs lose ~2% to f32 (the in-kernel downcast costs more than the
    saved traffic buys), so f32 is the default.

    PEAK-HBM CAPACITY COST (ADVICE r4): the spill holds residuals per
    block until the backward consumes them — at the shipped patch-4
    geometry (batch 8192, N=50, group2) each block adds ~480 MB of f32
    probs + ~160 MB of bf16 ao, ~7-8 GB across the 12-block stack vs
    ~2 GB recompute-only. Configurations that fit under recompute can
    OOM or fail to compile with the spill on (group4/group8 and the
    1024-row budget did — results/RESULTS.md); there is no automatic
    fallback because the failure surfaces at XLA compile time, outside
    this module's control — set ``VST_MIDN_SAVEP=0`` to restore the
    recompute backward for larger batches.
    """
    import os

    v = os.environ.get("VST_MIDN_SAVEP", "1")
    if not v or v == "0":
        return ""
    return "bf16" if v == "2" else "f32"


def _is_per_image_tag(midn: str) -> bool:
    return midn.startswith("img") and midn != "imgb"


def _midn_tag_group(midn: str) -> int:
    """Group size encoded in a mid-N mode tag (``img`` -> 1, ``img4`` -> 4,
    ``img2p50`` -> 2, anything non-per-image -> 1). THE one place the tag
    format is parsed — kernels, builders and :func:`_savep_geometry` all go
    through here so a future tag change cannot silently diverge between
    them (ADVICE r4)."""
    if _is_per_image_tag(midn):
        return int(midn[3:].split("p")[0] or 1)
    return 1


def _midn_tag_nreal(midn: str, n: int) -> int:
    """Real (unpadded) tokens per image encoded in a per-image tag
    (``img2p50`` -> 50); defaults to ``n`` when no padding is in play."""
    if _is_per_image_tag(midn) and "p" in midn:
        return int(midn.rsplit("p", 1)[1])
    return n


def _savep_geometry(tile: int, n: int, heads: int, midn: str):
    """(effective_group, n_groups, gn, ps_rows) for the spilled-probs block
    layout at one tile: the probs are stored as a [heads * n_groups * gn,
    gn] stack of block-masked per-group probability matrices, in the same
    (head-major, group-minor) order :func:`_attn_fwd_per_image` emits them.
    Mirrors that function's fallback to group=1 when the tile's image count
    is not divisible by the group. Takes the midn mode tag directly so the
    layout is derived from the tag in exactly one place."""
    group = _midn_tag_group(midn)
    kimg = tile // n
    if kimg % group:
        group = 1
    gn = group * n
    n_groups = kimg // group
    return group, n_groups, gn, heads * n_groups * gn


def _attn_fwd_per_image(q, k, v, n, heads, scale, group=1, n_real=None):
    """Per-image attention for 2 < N <= 128: k·heads small MXU dots.

    Same math as the masked whole-tile formulation
    (ops/experimental/midn_alternatives.attn_fwd_general) without the
    masked cross-image FLOPs; ``ps`` is a [heads][k/group] nest of [group·N, group·N]
    probability matrices consumed by :func:`_attn_bwd_per_image`.
    ``group`` > 1 batches that many adjacent images into one block-masked
    dot (see :func:`_midn_group`).
    """
    t, e = q.shape
    kimg = t // n
    d = e // heads
    if kimg % group:
        group = 1
    gn = group * n
    neg = _attn_mask(gn, n, n_real if n_real is not None else n)
    outs = []
    ps = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        oimg, pimg = [], []
        for i in range(kimg // group):
            rs = slice(i * gn, (i + 1) * gn)
            s = jax.lax.dot_general(
                qh[rs].astype(jnp.bfloat16), kh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if neg is not None:
                s = s + neg
            p = _softmax_rows(s)
            pimg.append(p)
            oimg.append(jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        ps.append(pimg)
        outs.append(jnp.concatenate(oimg, axis=0))
    return jnp.concatenate(outs, axis=1), ps


def _attn_bwd_per_image(dao, q, k, v, ps, n, heads, scale, group=1):
    """Backward of :func:`_attn_fwd_per_image` given its per-head/img probs."""
    t, e = q.shape
    kimg = t // n
    d = e // heads
    if kimg % group:
        group = 1
    gn = group * n
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], dao[:, sl]
        dqi, dki, dvi = [], [], []
        for i in range(kimg // group):
            rs = slice(i * gn, (i + 1) * gn)
            p = ps[h][i]
            pb = p.astype(jnp.bfloat16)
            dv = jax.lax.dot_general(
                pb, doh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doh[rs].astype(jnp.bfloat16), vh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            dsb = ds.astype(jnp.bfloat16)
            dqi.append(jax.lax.dot_general(
                dsb, kh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale)
            dki.append(jax.lax.dot_general(
                dsb, qh[rs].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale)
            dvi.append(dv)
        dqs.append(jnp.concatenate(dqi, axis=0))
        dks.append(jnp.concatenate(dki, axis=0))
        dvs.append(jnp.concatenate(dvi, axis=0))
    return (jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
            jnp.concatenate(dvs, axis=1))


def _attn_bwd(dao, q, k, v, a_s, a_c, pk, pv, g_mat, scale):
    """Pair attention backward; returns (dq, dk, dv)."""
    dv = a_s * dao + _partner(a_c * dao)
    da_s = _group_sum(dao * v, g_mat)
    da_c = _group_sum(dao * pv, g_mat)
    s_dot = a_s * da_s + a_c * da_c
    ds_s = a_s * (da_s - s_dot)
    ds_c = a_c * (da_c - s_dot)
    dq = (ds_s * k + ds_c * pk) * scale
    dk = ds_s * q * scale + _partner(ds_c * q * scale)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_body(x, params, m1, m2, e, heads, n, midn="masked", saved=None,
              abl=""):
    """Shared forward trace; returns dict of intermediates.

    ``midn`` selects the mid-N (2 < N <= 128) attention formulation:
    ``img`` / ``imgb`` / ``masked`` (see :func:`_midn_mode`); unused at
    N == 2 (the pair path). ``saved`` (per-image modes only) is an
    optional ``(ps_nest, ao)`` pair spilled by the forward kernel
    (:func:`_midn_savep`): when present the attention forward is skipped
    entirely — q/k/v are still produced for the attention backward.

    Weight matrices in ``params`` arrive bf16 (cast ONCE per step by the
    host-side wrapper — an in-kernel f32 load + downcast burned ~440k VPU
    cast ops per row tile); vector params (LN scales/biases, biases) stay
    f32. All activation math is f32 with bf16 matmul inputs, as before.
    """
    (ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     ln2s, ln2b, w1, b1, w2, b2) = params
    d = e // heads
    scale = 1.0 / float(d) ** 0.5
    g_mat = _group_matrix(e, d) if n == 2 else None
    if "l" in abl:  # measurement-only ablation: stats skipped
        def ln_fwd(a, sc, bi):
            return a * sc + bi, None, None
    else:
        ln_fwd = _ln_fwd_stats

    y1, mu1, r1 = ln_fwd(x, ln1s, ln1b)
    if "Q" in abl:  # one wide [E, 3E] dot (see _qkv_fused)
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)
        qkv = _mm(y1, wqkv) + jnp.concatenate([bq, bk, bv], axis=1)
        q = qkv[:, :e]
        k = qkv[:, e:2 * e]
        v = qkv[:, 2 * e:]
    else:
        q = _mm(y1, wq) + bq
        k = _mm(y1, wk) + bk
        v = _mm(y1, wv) + bv
    if n == 2:
        ao, a_s, a_c, pk, pv = _attn_fwd(q, k, v, g_mat, scale)
        ps = None
    elif midn == "off":  # measurement-only ablation (see _midn_mode)
        ao = v
        ps = None
        a_s = a_c = pk = pv = None
    elif midn == "imgb":  # quarantined measured loser (A/B only)
        from vision_spectra_tpu.ops.experimental import midn_alternatives

        ao, ps = midn_alternatives.attn_fwd_per_image_batched(
            q, k, v, n, heads, scale
        )
        a_s = a_c = pk = pv = None
    elif midn.startswith("img"):  # "img" or "img{group}"
        if saved is not None:
            ps, ao = saved
        else:
            ao, ps = _attn_fwd_per_image(
                q, k, v, n, heads, scale, group=_midn_tag_group(midn),
                n_real=_midn_tag_nreal(midn, n),
            )
        a_s = a_c = pk = pv = None
    else:  # "masked" — quarantined measured loser (A/B only)
        from vision_spectra_tpu.ops.experimental import midn_alternatives

        ao, ps = midn_alternatives.attn_fwd_general(q, k, v, n, heads, scale)
        a_s = a_c = pk = pv = None
    p = _mm(ao, wp) + bp
    x_mid = x + m1 * p
    y2, mu2, r2 = ln_fwd(x_mid, ln2s, ln2b)
    u = _mm(y2, w1) + b1
    if "g" in abl:  # measurement-only: identity activation
        tg = None
        h = u
    else:
        tg = _gelu_t(u)
        h = _gelu(u, tg)
    o = _mm(h, w2) + b2
    x_out = x_mid + m2 * o
    return dict(y1=y1, q=q, k=k, v=v, ao=ao, a_s=a_s, a_c=a_c, pk=pk,
                pv=pv, ps=ps, x_mid=x_mid, y2=y2, u=u, h=h, tg=tg,
                x_out=x_out, g_mat=g_mat, scale=scale,
                mu1=mu1, r1=r1, mu2=mu2, r2=r2)


# Param indices whose arrays are weight MATRICES (shipped to the kernel in
# bf16); the rest are [1, D] vectors that stay f32.
_WEIGHT_IDX = (2, 4, 6, 8, 12, 14)


def _load_params(param_refs):
    """Load param blocks: f32 vectors as-is, bf16 weights untouched."""
    return tuple(
        r[...] if i in _WEIGHT_IDX else r[...].astype(jnp.float32)
        for i, r in enumerate(param_refs)
    )


def _make_fwd_kernel(e: int, f: int, heads: int, n: int, out_dtype,
                     midn: str, savep: str = "", abl: str = ""):
    def kernel(x_ref, *refs):
        param_refs = refs[:N_PARAMS]
        if savep:
            m1_ref, m2_ref, o_ref, ps_ref, ao_ref = refs[N_PARAMS:]
        else:
            m1_ref, m2_ref, o_ref = refs[N_PARAMS:]
        x = x_ref[...].astype(jnp.float32)
        params = _load_params(param_refs)
        t = _fwd_body(x, params, m1_ref[...], m2_ref[...], e, heads, n,
                      midn, abl=abl)
        o_ref[...] = t["x_out"].astype(out_dtype)
        if savep:
            # Spill the per-image probs (head-major, group-minor — the
            # order _attn_fwd_per_image emits) and the attention output
            # for the backward kernel (see _midn_savep).
            tile = x_ref.shape[0]
            _, n_groups, gn, _ = _savep_geometry(tile, n, heads, midn)
            for h in range(heads):
                for i in range(n_groups):
                    j = h * n_groups + i
                    ps_ref[j * gn:(j + 1) * gn, :] = (
                        t["ps"][h][i].astype(ps_ref.dtype)
                    )
            ao_ref[...] = t["ao"].astype(jnp.bfloat16)

    return kernel


def _make_bwd_kernel(e: int, f: int, heads: int, n: int, x_dtype,
                     midn: str, savep: str = "", abl: str = ""):
    def kernel(x_ref, *refs):
        param_refs = refs[:N_PARAMS]
        m1_ref, m2_ref, dy_ref = refs[N_PARAMS:N_PARAMS + 3]
        n_extra = 2 if savep else 0
        out_refs = refs[N_PARAMS + 3 + n_extra:]
        dx_ref = out_refs[0]
        grad_refs = out_refs[1:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in grad_refs:
                r[...] = jnp.zeros_like(r)

        x = x_ref[...].astype(jnp.float32)
        params = _load_params(param_refs)
        (ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
         ln2s, ln2b, w1, b1, w2, b2) = params
        m1 = m1_ref[...]
        m2 = m2_ref[...]
        saved = None
        if savep:
            ps_ref, ao_ref = refs[N_PARAMS + 3:N_PARAMS + 5]
            tile = x_ref.shape[0]
            _, n_groups, gn, _ = _savep_geometry(tile, n, heads, midn)
            ps_nest = []
            for h in range(heads):
                pimg = []
                for i in range(n_groups):
                    j = h * n_groups + i
                    pimg.append(
                        ps_ref[j * gn:(j + 1) * gn, :].astype(jnp.float32)
                    )
                ps_nest.append(pimg)
            saved = (ps_nest, ao_ref[...].astype(jnp.float32))
        t = _fwd_body(x, params, m1, m2, e, heads, n, midn, saved=saved,
                      abl=abl)
        dy = dy_ref[...].astype(jnp.float32)

        def ln_bwd(dyv, xv, sc, mu, r):
            if "l" in abl:  # measurement-only: stats skipped
                return (dyv * sc, jnp.sum(dyv * xv, axis=0, keepdims=True),
                        jnp.sum(dyv, axis=0, keepdims=True))
            return _ln_bwd(dyv, xv, sc, mu, r)

        # MLP branch.
        do = dy * m2
        dh = _mm_t(do, w2)
        dw2 = _mm_grad(t["h"], do)
        db2 = jnp.sum(do, axis=0, keepdims=True)
        du = dh if "g" in abl else dh * _dgelu(t["u"], t["tg"])
        dy2 = _mm_t(du, w1)
        dw1 = _mm_grad(t["y2"], du)
        db1 = jnp.sum(du, axis=0, keepdims=True)
        dx_ln2, ds2, dbe2 = ln_bwd(dy2, t["x_mid"], ln2s, t["mu2"],
                                   t["r2"])
        dxm = dy + dx_ln2

        # Attention branch.
        dp_ = dxm * m1
        dao = _mm_t(dp_, wp)
        dwp = _mm_grad(t["ao"], dp_)
        dbp = jnp.sum(dp_, axis=0, keepdims=True)
        if n == 2:
            dq, dk, dv = _attn_bwd(
                dao, t["q"], t["k"], t["v"], t["a_s"], t["a_c"], t["pk"],
                t["pv"], t["g_mat"], t["scale"],
            )
        elif midn == "off":  # measurement-only ablation (see _midn_mode)
            # Pass dao through to all three so every surrounding matmul
            # stays live with data-dependent operands (zeros could be
            # constant-folded, over-ablating the measurement).
            dq = dk = dv = dao
        elif midn == "imgb":  # quarantined measured loser (A/B only)
            from vision_spectra_tpu.ops.experimental import midn_alternatives

            dq, dk, dv = midn_alternatives.attn_bwd_per_image_batched(
                dao, t["q"], t["k"], t["v"], t["ps"], n, heads, t["scale"],
            )
        elif midn.startswith("img"):  # "img" or "img{group}"
            dq, dk, dv = _attn_bwd_per_image(
                dao, t["q"], t["k"], t["v"], t["ps"], n, heads, t["scale"],
                group=_midn_tag_group(midn),
            )
        else:  # "masked" — quarantined measured loser (A/B only)
            from vision_spectra_tpu.ops.experimental import midn_alternatives

            dq, dk, dv = midn_alternatives.attn_bwd_general(
                dao, t["q"], t["k"], t["v"], t["ps"], heads, t["scale"],
            )
        if "Q" in abl:  # fused dy1 + dW dots (see _qkv_fused)
            dqkv = jnp.concatenate([dq, dk, dv], axis=1)
            dy1 = _mm_t(dqkv, jnp.concatenate([wq, wk, wv], axis=1))
            dwqkv = _mm_grad(t["y1"], dqkv)
            dwq = dwqkv[:, :e]
            dwk = dwqkv[:, e:2 * e]
            dwv = dwqkv[:, 2 * e:]
            dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
            dbq = dbqkv[:, :e]
            dbk = dbqkv[:, e:2 * e]
            dbv = dbqkv[:, 2 * e:]
        else:
            dy1 = _mm_t(dq, wq) + _mm_t(dk, wk) + _mm_t(dv, wv)
            dwq = _mm_grad(t["y1"], dq)
            dbq = jnp.sum(dq, axis=0, keepdims=True)
            dwk = _mm_grad(t["y1"], dk)
            dbk = jnp.sum(dk, axis=0, keepdims=True)
            dwv = _mm_grad(t["y1"], dv)
            dbv = jnp.sum(dv, axis=0, keepdims=True)
        dx_ln1, ds1, dbe1 = ln_bwd(dy1, x, ln1s, t["mu1"], t["r1"])

        dx_ref[...] = (dxm + dx_ln1).astype(x_dtype)
        if "w" not in abl:  # 'w': weight-grad matmuls+accumulation ablated
            grads = (ds1, dbe1, dwq, dbq, dwk, dbk, dwv, dbv, dwp, dbp,
                     ds2, dbe2, dw1, db1, dw2, db2)
            for r, g in zip(grad_refs, grads):
                r[...] += g

    return kernel


def _param_specs(shapes):
    return [
        pl.BlockSpec(s, lambda i, _n=len(s): (0,) * _n)
        for s in shapes
    ]


def _param_shapes(e: int, f: int):
    ee, ve, vf = (e, e), (1, e), (1, f)
    return [ve, ve, ee, ve, ee, ve, ee, ve, ee, ve, ve, ve,
            (e, f), vf, (f, e), ve]


@functools.lru_cache(maxsize=None)
def _build_fwd(rows: int, e: int, f: int, heads: int, n: int, tile: int,
               dtype_name: str, interpret: bool, midn: str = "masked",
               savep: str = "", abl: str = ""):
    out_dtype = jnp.dtype(dtype_name)
    kernel = _make_fwd_kernel(e, f, heads, n, out_dtype, midn, savep, abl)
    out_specs = pl.BlockSpec((tile, e), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((rows, e), out_dtype)
    if savep:
        _, _, gn, ps_rows = _savep_geometry(tile, n, heads, midn)
        grid = rows // tile
        out_specs = [
            out_specs,
            pl.BlockSpec((ps_rows, gn), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct(
                (grid * ps_rows, gn),
                jnp.bfloat16 if savep == "bf16" else jnp.float32,
            ),
            jax.ShapeDtypeStruct((rows, e), jnp.bfloat16),
        ]
    return pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(_param_shapes(e, f)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build_bwd(rows: int, e: int, f: int, heads: int, n: int, tile: int,
               dtype_name: str, interpret: bool, midn: str = "masked",
               savep: str = "", abl: str = ""):
    x_dtype = jnp.dtype(dtype_name)
    kernel = _make_bwd_kernel(e, f, heads, n, x_dtype, midn, savep, abl)
    grad_shapes = _param_shapes(e, f)
    savep_specs = []
    if savep:
        _, _, gn, ps_rows = _savep_geometry(tile, n, heads, midn)
        savep_specs = [
            pl.BlockSpec((ps_rows, gn), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(grad_shapes),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *savep_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0)),
            *_param_specs(grad_shapes),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, e), x_dtype),
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        ],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _cast_weights(params):
    """Weight matrices -> bf16 ONCE on the XLA side (same rounding the
    kernel's per-matmul casts applied; now paid per step, not per tile)."""
    return tuple(
        p.astype(jnp.bfloat16) if i in _WEIGHT_IDX else p
        for i, p in enumerate(params)
    )


def _midn_mode_tag(n: int, n_real: int | None = None) -> str:
    """Mode string for the kernel builders (part of the lru cache key):
    ``pair`` at N == 2; otherwise the mid-N mode, with a per-image group
    size > 1 folded in as ``img{g}`` and a padded token count as
    ``p{n_real}`` (``img2p50``: group-2 dots over 56-token images of which
    50 are real — see :func:`padded_tokens`)."""
    if n == 2:
        return "pair"
    mode = _midn_mode()
    if mode == "img":
        g = _midn_group(n)
        if g > 1:
            mode = f"img{g}"
        if n_real is not None and n_real != n:
            mode += f"p{n_real}"
    elif n_real is not None and n_real != n:
        raise ValueError(
            f"token padding (n_real={n_real} != n={n}) is only supported on "
            f"the per-image mid-N path, not mode {mode!r}"
        )
    return mode


def _savep_for_tag(tag: str) -> str:
    """The spill mode for this kernel tag — per-image unrolled modes only
    (``img`` / ``img{g}``; the pair, masked, batched and ablation paths
    keep their recompute backward)."""
    if _is_per_image_tag(tag) and tag != "pair":
        return _midn_savep()
    return ""


def _run_fwd(heads, n, n_real, interpret, x, params, m1, m2):
    rows, e = x.shape
    f = params[12].shape[1]
    tile = select_tile(rows, n)
    call = _build_fwd(rows, e, f, heads, n, tile, x.dtype.name, interpret,
                      _midn_mode_tag(n, n_real), "", _abl_flags())
    return call(x, *_cast_weights(params), m1, m2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_block(heads, n, n_real, interpret, x, params, m1, m2):
    return _run_fwd(heads, n, n_real, interpret, x, params, m1, m2)


def _fused_block_fwd(heads, n, n_real, interpret, x, params, m1, m2):
    tag = _midn_mode_tag(n, n_real)
    savep = _savep_for_tag(tag)
    if savep:
        rows, e = x.shape
        f = params[12].shape[1]
        tile = select_tile(rows, n)
        call = _build_fwd(rows, e, f, heads, n, tile, x.dtype.name,
                          interpret, tag, savep, _abl_flags())
        out, ps_buf, ao_buf = call(x, *_cast_weights(params), m1, m2)
        return out, (x, params, m1, m2, ps_buf, ao_buf)
    return (_run_fwd(heads, n, n_real, interpret, x, params, m1, m2),
            (x, params, m1, m2, None, None))


def _fused_block_bwd(heads, n, n_real, interpret, res, dy):
    x, params, m1, m2, ps_buf, ao_buf = res
    rows, e = x.shape
    f = params[12].shape[1]
    tile = select_tile(rows, n)
    tag = _midn_mode_tag(n, n_real)
    savep = _savep_for_tag(tag) if ps_buf is not None else ""
    call = _build_bwd(rows, e, f, heads, n, tile, x.dtype.name, interpret,
                      tag, savep, _abl_flags())
    extra = (ps_buf, ao_buf) if savep else ()
    out = call(x, *_cast_weights(params), m1, m2, dy.astype(x.dtype),
               *extra)
    dx = out[0]
    dparams = tuple(
        g.astype(p.dtype).reshape(p.shape)
        for g, p in zip(out[1:], params)
    )
    return dx, dparams, jnp.zeros_like(m1), jnp.zeros_like(m2)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_vit_block(
    x: jnp.ndarray,
    params: tuple,
    m1: jnp.ndarray,
    m2: jnp.ndarray,
    *,
    num_heads: int,
    n_tokens: int = 2,
    n_real: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One pre-LN transformer block as a single fused kernel.

    Args:
        x: activations [rows, E], rows = batch * n_tokens, image-major so
            each image's tokens occupy adjacent rows; ``select_tile(rows,
            n_tokens)`` must be non-None.
        params: 16-tuple in the layout documented at module top (f32;
            vector params reshaped to [1, D]).
        m1 / m2: drop-path keep masks for the attention / MLP residual
            branches, [rows, 1] f32 (already divided by the keep rate; pass
            ones when deterministic).
        num_heads: attention heads; E must divide evenly.
        n_tokens: tokens per image — 2 selects the pair-attention path, 3
            to 128 the per-image mid-N path (masked [T, T] fallback via
            ``VST_MIDN_MASKED=1``).
        n_real: real tokens per image when the caller padded each image to
            ``n_tokens`` rows for sublane alignment (:func:`padded_tokens`);
            dummy keys are masked out of every real query's softmax and
            dummy rows carry exact-zero cotangents. Defaults to
            ``n_tokens`` (no padding).

    Returns [rows, E] activations in ``x.dtype``. Differentiable wrt ``x``
    and ``params`` (masks receive zero cotangents).

    ``VST_P4_HYBRID=1`` (mid-N only) reroutes through the quarantined
    split-stage hybrid (ops/experimental/block_hybrid.py): Pallas LN1+QKV,
    head-batched XLA attention, Pallas proj+LN2+MLP — an env-gated
    measured-loser kept for A/B (results/bench_p4_breakdown.py).
    """
    if n_tokens > 2:
        from vision_spectra_tpu.core.runtime import env_flag

        if env_flag("VST_P4_HYBRID"):
            from vision_spectra_tpu.ops.experimental.block_hybrid import (
                hybrid_vit_block,
            )

            return hybrid_vit_block(
                x, params, m1, m2, num_heads=num_heads,
                n_tokens=n_tokens, interpret=interpret,
            )
    return _fused_block(num_heads, n_tokens,
                        n_tokens if n_real is None else n_real,
                        interpret, x, params, m1, m2)
