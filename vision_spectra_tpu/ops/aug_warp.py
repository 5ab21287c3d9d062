"""Fused augmentation warp as a single Pallas TPU kernel.

The XLA matmul formulation of the augmentation warp (data/transforms.py)
materializes [B, H, W, H]-shaped interpolation-weight tensors and a
[B, H, W, W, C] intermediate in HBM — at 28 px that traffic (with lane
padding, the minor dims are 28 → padded to 128) makes augmentation ~50% of
the fused train-step time. This kernel keeps everything per-image in VMEM:

- grid over the batch, one image per program (Mosaic double-buffers the
  image DMA across grid steps);
- the warp is two contractions against hat-function (bilinear) or indicator
  (nearest) weight matrices built in VMEM from the per-image affine params —
  mathematically identical to the XLA path, lane dim = H·W (784 at 28 px);
- the torchvision two-resample recipe runs as ONE warp: two nearest warps
  compose exactly (``out[p] = I[round(A1·round(A2·p))]`` — the intermediate
  is only sampled at integer coords), with an explicit bounds mask where the
  intermediate would have been zero fill;
- the second contraction runs packed at [W·C, H·W] in bf16 (multiply +
  W-fold via one small MXU matmul) so intermediates keep full 8-sublane
  vregs at half the f32 register traffic — pixel values ride raw 0..255
  (exact in bf16) with the 1/255 rescale folded into normalization — and
  ColorJitter (fixed order, or per-sample shuffled order via opcodes) +
  normalization run channel-major in f32 over the whole image group
  ([C·G, H·W]) before a single [C, G, H·W] output write — 30% faster than
  the per-image-major layout;
- source coordinates are computed for the whole group at once ([G, H·W]
  rows) instead of per-image [1, H·W] chains — profiling showed vector-op
  ISSUE count, not arithmetic, bounds this kernel (an empty kernel with
  the same grid/DMA pattern runs in 0.27 ms vs ~5 ms full at batch 8192).

No backward pass exists or is needed: augmentation sits between the uint8
batch and the model input, outside the differentiated parameter path.

Reference behavior: vision_spectra/data/transforms.py:10-55 (the torchvision
pipeline this reproduces). Numerics: nearest-mode warp selection is exact
(one-hot bf16 indicators selecting exact 0..255 bf16 values); jitter and
normalization are f32, so the kernel matches the XLA path to f32 rounding
in nearest mode and to ~1e-2 absolute (bf16 hat-weight contractions) in
bilinear mode; both are asserted in tests/test_ops.py. In compiled mode
FMA contraction can flip floor(x+0.5) rounding ties on ~1e-5 of pixels (a
one-pixel source shift on those pixels) — measured max-one-pixel
disagreement on 64x2352-px batches, immaterial for a random augmentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_augment", "use_pallas_warp"]

# Images per grid program, best-first (largest divisor of the batch wins,
# subject to keeping >=4 grid steps so the image DMAs stay pipelined).
# With the group-level coordinate build, bigger groups keep paying: at
# batch 8192 / 28 px on v5e, nearest measured 3.05/2.91/2.69 ms at group
# 32/64/128 (256 regresses to 3.36 and compiles ~20 s). Group size only
# affects scheduling, never values.
GROUP_CANDIDATES = (128, 64, 32, 16, 8, 4, 2, 1)
MIN_GRID = 4
# VMEM guard: the channel-major group intermediates ([C*G, HW] f32 jitter
# stages, the xs accumulation, and the double-buffered [C, G, HW] output
# block) all scale with G*HW. Group 128 was measured safe at 28 px
# (HW=784); cap G*HW at that product so larger images (use_pallas_warp
# admits up to 64 px → HW=4096) scale the group down instead of
# oversubscribing the ~16 MB VMEM budget.
MAX_GROUP_ELEMS = 128 * 28 * 28


def use_pallas_warp(shape: tuple[int, ...], mesh=None) -> bool:
    """Whether the Pallas augmentation kernel should serve this batch.

    Single chip: direct pallas_call. Multi-device with an explicit ``mesh``:
    the kernel runs per-shard under ``jax.shard_map`` over the data axis
    (the warp is embarrassingly parallel over images); the per-shard batch
    must divide evenly. Multi-device WITHOUT a mesh keeps the XLA path —
    a bare pallas_call is not GSPMD-partitionable.
    """
    from vision_spectra_tpu.core.runtime import env_flag

    if env_flag("VST_NO_PALLAS_WARP"):
        return False
    b, h, w, c = shape
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() > 1 or (mesh is not None and mesh.size > 1):
        if mesh is None:
            return False
        from vision_spectra_tpu.parallel.mesh import DATA_AXIS

        # warp_augment only wraps in shard_map when the DATA axis is sharded;
        # a tensor-parallel-only mesh (data=1, model=N) would otherwise reach
        # a bare pallas_call inside a multi-device program — not
        # GSPMD-partitionable. Keep the XLA path there.
        if mesh.shape[DATA_AXIS] <= 1 or b % mesh.shape[DATA_AXIS]:
            return False
    # VMEM budget: per-image warp temporaries are [H, HW] + [W*C, HW] bf16
    # and the group-level jitter/output blocks scale with G*HW (bounded by
    # MAX_GROUP_ELEMS in _pick_group); past 64 px even group 1 pays ~4 MB
    # per image and the XLA gather path wins.
    return c in (1, 3) and 8 <= h <= 64 and 8 <= w <= 64


def _grayscale_cm(x: jnp.ndarray, g: int, c: int) -> jnp.ndarray:
    """Channel-major [C*G, HW] -> [G, HW] luminance (identity for c=1)."""
    if c == 3:
        return 0.299 * x[0:g] + 0.587 * x[g:2 * g] + 0.114 * x[2 * g:3 * g]
    return x


def _cm_bcast(v, c: int):
    """[G, D] -> [C*G, D]: repeat per-image rows over the channel blocks.
    Mosaic cannot broadcast sublanes AND lanes in one op, and a
    ``broadcast_to`` would be folded back into exactly that (MLIR
    canonicalizes broadcast-of-broadcast), so the channel copies are
    materialized with ``concatenate`` — a real op that survives
    canonicalization."""
    if c == 1:
        return v
    return jnp.concatenate([v] * c, axis=0)


def _jitter_fixed_cm(x, g, fb, fc, fs, c):
    """data/transforms._color_jitter semantics: fixed order, gray reused.

    Channel-major over the program's image group: ``x`` [C*G, HW] (row
    ch*G + g is image g's channel ch), factors [C*G, 1] — every vreg rides
    full 8 sublanes instead of C=3 sublanes per image (2.7x fewer VPU ops).
    Values ride in the raw 0..255 domain (every jitter op is linear in
    scale, and clip(255*v, 0, 255) == 255*clip(v, 0, 1)); per-element math
    is otherwise identical to the per-image [0, 1] form.
    """
    x = jnp.clip(x * fb, 0.0, 255.0)
    gray = _grayscale_cm(x, g, c)
    mean_gray = _cm_bcast(jnp.mean(gray, axis=1, keepdims=True), c)
    x = jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 255.0)
    if c == 3:
        gray3 = _cm_bcast(gray, c)
        x = jnp.clip((x - gray3) * fs + gray3, 0.0, 255.0)
    return x


def _jitter_shuffled_cm(x, g, fb, fc, fs, o0, o1, o2, c):
    """data/transforms._color_jitter_shuffled semantics: per-stage opcode.

    Channel-major like :func:`_jitter_fixed_cm` (same raw 0..255 domain);
    per stage the three candidate ops are computed group-wide and selected
    by the per-image opcode columns [C*G, 1] — identical values to
    torchvision's per-image random op order.
    """
    for op in (o0, o1, o2):
        gray = _grayscale_cm(x, g, c)
        mean_gray = _cm_bcast(jnp.mean(gray, axis=1, keepdims=True), c)
        xb = jnp.clip(x * fb, 0.0, 255.0)
        xc = jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 255.0)
        if c == 3:
            gray3 = _cm_bcast(gray, c)
            xs = jnp.clip((x - gray3) * fs + gray3, 0.0, 255.0)
        else:
            xs = x
        x = jnp.where(op == 0.0, xb, jnp.where(op == 1.0, xc, xs))
    return x


def _make_coords(h: int, w: int, c: int, bilinear: bool, group: int):
    """Group-level source-coordinate build.

    Returns ``coords(col, xo, yo) -> (cx, cy)`` where ``col(j)`` yields the
    j-th per-image parameter as a [G, 1] column and cx/cy are [G, HW] f32
    source coordinates (with the -1.0 out-of-bounds sentinel already folded
    into cy in nearest mode). Computing coordinates for the whole group at
    once replaces ~12 per-image [1, HW] op chains (1/8 sublane occupancy,
    ~84 vregs each) with ~12 [G, HW] ops — a ~10x cut in vector-op issue,
    which profiling showed (not the arithmetic) dominates this kernel.
    """

    def coords(col, xo, yo):
        if bilinear:
            # Single bilinear warp: params 0-5 = inverse affine.
            cx = col(0) * xo + col(1) * yo + col(2)
            cy = col(3) * xo + col(4) * yo + col(5)
            return cx, cy
        # Composed nearest warps: 0-5 = rot (pass 1), 6-11 = aff (pass 2).
        sx2 = col(6) * xo + col(7) * yo + col(8)
        sy2 = col(9) * xo + col(10) * yo + col(11)
        qx = jnp.floor(sx2 + 0.5)
        qy = jnp.floor(sy2 + 0.5)
        valid = (qx >= 0) & (qx < w) & (qy >= 0) & (qy < h)
        rx = jnp.floor(col(0) * qx + col(1) * qy + col(2) + 0.5)
        ry = jnp.floor(col(3) * qx + col(4) * qy + col(5) + 0.5)
        # Out-of-bounds fold: send ry to the -1 sentinel so wy's column
        # is all-zero — one select instead of a separate valid AND-mask.
        ry = jnp.where(valid, ry, -1.0)
        return rx, ry

    return coords


def _make_warp_one(h: int, w: int, c: int, bilinear: bool):
    """One image's warp: weight build + both contractions in VMEM.

    ``warp_one(cx, cy, img_ref_slice, srows, tcols, ones_fold) -> [C, HW]``
    f32, where cx/cy are the image's [1, HW] source coordinates (see
    :func:`_make_coords`) and ``tcols`` the packed [W*C, HW] column-index
    array (row t*C+ch holds t). The one-hot / hat weight matrices and the
    phase-2 product are kept in bf16 — 0..255 pixel values and 0/1
    indicators are EXACT in bf16 (8-bit significand), so the nearest path
    is bit-identical while every [W*C, HW] intermediate costs half the
    vector registers of the earlier f32 form. The W-fold reduction runs as
    one small MXU matmul against ``ones_fold`` [C, W*C]
    (ones_fold[ch, t*C+ch'] = ch==ch') instead of 27 strided [C, HW]
    sublane adds. Fusing both phases per image keeps only one image's
    [W*C, HW] temporaries live at a time, which is what lets the group
    size scale to 32 (and to 64-px images) within VMEM.
    """
    hw = h * w
    del hw  # shape bookkeeping only

    def warp_one(cx, cy, img_ref_slice, srows, tcols, ones_fold):
        if bilinear:
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy - srows)).astype(
                jnp.bfloat16)  # [H, HW]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - tcols)).astype(
                jnp.bfloat16)  # [W*C, HW]
        else:
            wy = (srows == cy).astype(jnp.bfloat16)  # [H, HW]
            wx = (tcols == cx).astype(jnp.bfloat16)  # [W*C, HW]

        # uint8 -> int32 -> bf16 (Mosaic lacks direct uint8->float casts;
        # integers 0..255 are exact in bf16, and the 1/255 rescale is
        # folded into the final normalization constants).
        img = img_ref_slice.astype(jnp.int32).astype(jnp.bfloat16)
        # Phase 1: tmp[t*C+ch, yx] = sum_s img[s, t*C+ch] * wy[s, yx].
        # Mosaic mandates f32 matmul accumulation; the bf16 round-down is
        # exact in nearest mode (one-hot columns select single 0..255
        # values), and in bilinear mode the 2-term hat sums round at 2^-8
        # relative — far inside the parity tolerance.
        tmp = jax.lax.dot_general(
            img, wy,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [W*C, HW]
        # Phase 2, packed: out[ch, yx] = sum_t (tmp*wx)[t*C+ch, yx] via the
        # MXU (f32 accumulation).
        return jax.lax.dot_general(
            ones_fold, tmp * wx,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, HW] f32, values 0..255

    return warp_one


def _make_group_body(h: int, w: int, c: int, bilinear: bool,
                     mean: tuple[float, ...], std: tuple[float, ...],
                     group: int, out_dtype=jnp.float32):
    """The shared kernel body: group-level coordinate build, per-image
    fused warps (bf16 phases), then jitter + normalize channel-major over
    the group and a single output-block write. Layout [C, G, HW]
    (channel-major) end to end — measured 30% faster than the per-image
    [G, C, HW] form at batch 8192 / 28 px. Pixel values ride the kernel
    in the raw 0..255 domain; the 1/255 rescale is folded into the
    normalization constants (one fewer full-width pass, and uint8 -> bf16
    stays exact)."""
    hw = h * w
    # Python-float constants (Pallas kernels cannot capture array
    # constants). (x/255 - mean)/std == x * a + b with:
    a_norm = tuple(1.0 / (255.0 * float(s)) for s in std)
    b_norm = tuple(-float(m) / float(s) for m, s in zip(mean, std))
    warp_one = _make_warp_one(h, w, c, bilinear)
    coords = _make_coords(h, w, c, bilinear, group)

    def run_group(params_ref, img_slices, out_ref):
        # Index arrays hoisted once per program, shared by every image.
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
        xo = (idx % w).astype(jnp.float32)
        yo = (idx // w).astype(jnp.float32)
        srows = jax.lax.broadcasted_iota(
            jnp.int32, (h, hw), 0).astype(jnp.float32)
        # Packed column indices at [W*C, HW]: row t*C+ch holds t.
        tcols = (
            jax.lax.broadcasted_iota(jnp.int32, (w * c, hw), 0) // c
        ).astype(jnp.float32)
        # Fold matrix [C, W*C]: ones_fold[ch, t*C+ch'] = (ch == ch').
        ones_fold = (
            jax.lax.broadcasted_iota(jnp.int32, (c, w * c), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (c, w * c), 1) % c
        ).astype(jnp.bfloat16)

        def col(j):
            return jnp.concatenate(
                [params_ref[g, 0, j].reshape(1, 1) for g in range(group)],
                axis=0,
            )  # [G, 1]

        # Source coordinates for the WHOLE group at once: [G, HW].
        cx, cy = coords(col, xo, yo)

        xs = []
        for g in range(group):
            xs.append(warp_one(
                cx[g:g + 1], cy[g:g + 1], img_slices[g], srows, tcols,
                ones_fold,
            ))

        # Channel-major packing: row ch*group + g. Values 0..255 f32.
        x_cm = jnp.concatenate(
            [xs[g][ch:ch + 1] for ch in range(c) for g in range(group)],
            axis=0,
        )  # [C*G, HW]

        def colb(j):
            return _cm_bcast(col(j), c)  # [C*G, 1]

        if bilinear:
            x_cm = _jitter_fixed_cm(
                x_cm, group, colb(12), colb(13), colb(14), c)
        else:
            x_cm = _jitter_shuffled_cm(
                x_cm, group, colb(12), colb(13), colb(14),
                colb(15), colb(16), colb(17), c,
            )
        norm = jnp.concatenate(
            [x_cm[i * group:(i + 1) * group] * a_norm[i] + b_norm[i]
             for i in range(c)],
            axis=0,
        )
        out_ref[...] = norm.reshape(c, group, hw).astype(out_dtype)

    return run_group


def _make_kernel(h: int, w: int, c: int, bilinear: bool,
                 mean: tuple[float, ...], std: tuple[float, ...],
                 group: int, out_dtype=jnp.float32):
    run_group = _make_group_body(h, w, c, bilinear, mean, std, group, out_dtype)

    def kernel(params_ref, img_ref, out_ref):
        # ``group`` images per grid step (statically unrolled): one-image
        # programs are DMA/grid-overhead bound at 28 px (~1.5 us/image);
        # grouping amortizes that ~3x and lets phase 2 vectorize over the
        # group's C-channel rows.
        run_group(params_ref, [img_ref[g] for g in range(group)], out_ref)

    return kernel


def _make_kernel_gather(h: int, w: int, c: int, bilinear: bool,
                        mean: tuple[float, ...], std: tuple[float, ...],
                        group: int, out_dtype=jnp.float32):
    """Kernel variant whose image blocks are fetched by INDEX.

    The epoch-level shuffle gather becomes free: each of the ``group`` image
    operands is the SAME resident dataset array, and its BlockSpec index_map
    reads the scalar-prefetched permutation — Mosaic double-buffers the
    per-image row DMAs across grid steps exactly like the contiguous path.
    """
    run_group = _make_group_body(h, w, c, bilinear, mean, std, group, out_dtype)

    def kernel(idx_ref, params_ref, *refs):
        del idx_ref  # consumed by the BlockSpec index maps
        img_refs = refs[:group]
        out_ref = refs[group]
        run_group(params_ref, [img_refs[g][0] for g in range(group)], out_ref)

    return kernel


def _pick_group(b: int, hw: int) -> int:
    # Largest divisor that still leaves MIN_GRID pipelined grid steps AND
    # fits the VMEM cost model (group scales down as images grow); tiny
    # batches (b < 4*MIN_GRID) just take their largest fitting divisor.
    cap = max(1, MAX_GROUP_ELEMS // hw)
    for g in GROUP_CANDIDATES:
        if g <= cap and b % g == 0 and b // g >= MIN_GRID:
            return g
    return next(g for g in GROUP_CANDIDATES if b % g == 0 and g <= cap)


@functools.lru_cache(maxsize=None)
def _build_call(b: int, h: int, w: int, c: int, bilinear: bool,
                mean: tuple[float, ...], std: tuple[float, ...],
                interpret: bool, out_dtype_name: str = "float32"):
    out_dtype = jnp.dtype(out_dtype_name)
    group = _pick_group(b, h * w)
    kernel = _make_kernel(h, w, c, bilinear, mean, std, group, out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            # Last two block dims must equal the array dims for the TPU
            # lowering, hence the singleton axis on the params array.
            pl.BlockSpec((group, 1, 20), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, h, w * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, group, h * w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, b, h * w), out_dtype),
        interpret=interpret,
    )


def _gather_img_index(i, idx_ref, *, g: int, group: int):
    return (idx_ref[group * i + g], 0, 0)


@functools.lru_cache(maxsize=None)
def _build_call_gather(n: int, b: int, h: int, w: int, c: int, bilinear: bool,
                       mean: tuple[float, ...], std: tuple[float, ...],
                       interpret: bool, out_dtype_name: str = "float32"):
    """pallas_call fetching each image by scalar-prefetched index from the
    full [n, ...] resident dataset (the fused-epoch shuffle, for free)."""
    out_dtype = jnp.dtype(out_dtype_name)
    group = _pick_group(b, h * w)
    kernel = _make_kernel_gather(h, w, c, bilinear, mean, std, group, out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, 1, 20), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            *[
                pl.BlockSpec(
                    (1, h, w * c),
                    functools.partial(_gather_img_index, g=g, group=group),
                    memory_space=pltpu.VMEM,
                )
                for g in range(group)
            ],
        ],
        out_specs=pl.BlockSpec((c, group, h * w), lambda i, idx: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, b, h * w), out_dtype),
        interpret=interpret,
    ), group


def warp_augment(
    images: jnp.ndarray,
    mat1: jnp.ndarray,
    mat2: jnp.ndarray | None,
    factors: jnp.ndarray,
    opcodes: jnp.ndarray | None,
    mean: np.ndarray,
    std: np.ndarray,
    *,
    num_channels: int,
    bilinear: bool,
    interpret: bool = False,
    mesh=None,
    out_dtype=None,
    gather_indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Warp + jitter + normalize a uint8 batch in one Pallas dispatch.

    Args:
        images: uint8 [B, H, W, C] — or, with ``gather_indices``, the FULL
            resident dataset [N, H, W, C] from which each image is DMA'd by
            index (the fused-epoch shuffle gather, fused into this kernel).
        mat1: inverse 2x3 affines [B, 2, 3] — the single bilinear warp, or
            pass 1 (rotation/flip) of the composed nearest recipe.
        mat2: pass-2 (translate/scale) affines for the nearest recipe; None
            in bilinear mode.
        factors: jitter factors [B, 3] (brightness, contrast, saturation).
        opcodes: per-stage jitter opcodes [B, 3] (shuffled order); None in
            bilinear mode (fixed order).
        mean / std: per-channel normalization constants, shape [C].
        mesh: optional device mesh — the kernel then runs per-shard under
            ``jax.shard_map`` over the data axis. All per-image parameters
            are sampled by the CALLER with global batch semantics, so the
            augmentation draws match the single-device program exactly; only
            the pallas dispatch is sharded.
        out_dtype: output dtype (default float32). bf16-compute models cast
            the input at the first matmul anyway, so emitting bf16 here is
            numerically identical while halving the kernel's output traffic.
        gather_indices: optional int32 [B] row indices into ``images``;
            output row j augments ``images[gather_indices[j]]`` with row-j
            parameters — bit-identical to gathering first, without ever
            materializing the shuffled copy in HBM.

    Returns [B, H, W, C] in ``out_dtype`` (normalization always in f32).
    """
    if mesh is not None:
        from vision_spectra_tpu.parallel.mesh import DATA_AXIS

        if mesh.shape[DATA_AXIS] > 1:
            from jax.sharding import PartitionSpec as P

            # With gather_indices, the dataset stays replicated and only the
            # index vector (plus per-image params) shards over data.
            args = [images, mat1, factors]
            specs = [
                P(None, None, None, None) if gather_indices is not None
                else P(DATA_AXIS, None, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None),
            ]
            if mat2 is not None:
                args.append(mat2)
                specs.append(P(DATA_AXIS, None, None))
            if opcodes is not None:
                args.append(opcodes)
                specs.append(P(DATA_AXIS, None))
            if gather_indices is not None:
                args.append(gather_indices)
                specs.append(P(DATA_AXIS))

            def body(im, m1, fac, *rest):
                rest = list(rest)
                m2 = rest.pop(0) if mat2 is not None else None
                opc = rest.pop(0) if opcodes is not None else None
                idx = rest.pop(0) if gather_indices is not None else None
                return warp_augment(
                    im, m1, m2, fac, opc, mean, std,
                    num_channels=num_channels, bilinear=bilinear,
                    interpret=interpret, out_dtype=out_dtype,
                    gather_indices=idx,
                )

            return jax.shard_map(
                body,
                mesh=mesh,
                in_specs=tuple(specs),
                out_specs=P(DATA_AXIS, None, None, None),
                check_vma=False,  # pallas_call carries no vma info
            )(*args)

    n, h, w, cc = images.shape
    bsz = gather_indices.shape[0] if gather_indices is not None else n
    zeros6 = jnp.zeros((bsz, 6), jnp.float32)
    params = jnp.concatenate(
        [
            mat1.reshape(bsz, 6).astype(jnp.float32),
            mat2.reshape(bsz, 6).astype(jnp.float32)
            if mat2 is not None else zeros6,
            factors.astype(jnp.float32),
            opcodes.astype(jnp.float32)
            if opcodes is not None else zeros6[:, :3],
            jnp.zeros((bsz, 2), jnp.float32),
        ],
        axis=1,
    )
    mean_t = tuple(float(v) for v in np.asarray(mean).ravel())
    std_t = tuple(float(v) for v in np.asarray(std).ravel())
    dt_name = jnp.dtype(out_dtype or jnp.float32).name
    if gather_indices is not None:
        call, group = _build_call_gather(
            n, bsz, h, w, cc, bilinear, mean_t, std_t, interpret, dt_name
        )
        imgs = images.reshape(n, h, w * cc)
        out = call(
            gather_indices.astype(jnp.int32),
            params.reshape(bsz, 1, 20),
            *([imgs] * group),
        )
    else:
        call = _build_call(
            bsz, h, w, cc, bilinear, mean_t, std_t, interpret, dt_name
        )
        out = call(params.reshape(bsz, 1, 20), images.reshape(bsz, h, w * cc))
    # Kernel output is channel-major [C, B, HW].
    return out.transpose(1, 2, 0).reshape(bsz, h, w, cc)
