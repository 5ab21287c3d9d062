"""Device-side image transforms (augmentation + normalization) under jit.

TPU-native replacement for the reference's torchvision pipeline (reference:
vision_spectra/data/transforms.py:10-141). The host hands the chip raw uint8
NHWC batches; everything below runs inside the jitted train step:

- train: random horizontal flip (p=0.5), rotation ±15°, translate ±10%,
  scale 0.9–1.1 — composed into a **single** affine warp with one bilinear
  resample (the reference resamples twice: rotation then affine) — plus
  brightness/contrast jitter ±0.2 and saturation jitter ±0.1 (RGB only),
  then normalization.
- eval: normalization only.
- mim: flip + normalization (light augmentation preserving spatial structure).

Normalization matches the reference: ImageNet stats for 3-channel inputs,
mean/std 0.5 for grayscale (transforms.py:48-53).

All functions are pure ``(images, key) -> images`` and vectorized over the
batch; no per-sample host work remains.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
GRAY_MEAN = np.array([0.5], dtype=np.float32)
GRAY_STD = np.array([0.5], dtype=np.float32)

ROTATION_DEGREES = 15.0
TRANSLATE_FRAC = 0.1
SCALE_RANGE = (0.9, 1.1)
BRIGHTNESS = 0.2
CONTRAST = 0.2
SATURATION = 0.1


def _stats(num_channels: int) -> tuple[np.ndarray, np.ndarray]:
    if num_channels == 1:
        return GRAY_MEAN, GRAY_STD
    return IMAGENET_MEAN, IMAGENET_STD


def normalize(images: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """uint8/float [B,H,W,C] -> normalized float32."""
    mean, std = _stats(num_channels)
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    return (x - mean) / std


def denormalize(images: jnp.ndarray, num_channels: int = 3) -> jnp.ndarray:
    """Inverse of :func:`normalize`, clipped to [0, 1]."""
    mean, std = _stats(num_channels)
    return jnp.clip(images * std + mean, 0.0, 1.0)


def _affine_grid_sample(images: jnp.ndarray, inv_mats: jnp.ndarray) -> jnp.ndarray:
    """Inverse-warp a batch with per-sample 2x3 affines, bilinear, zero fill.

    ``inv_mats`` maps output pixel coords (x, y, 1) to input coords.

    Dispatches to the matmul formulation for small images (TPU gathers are
    ~50x slower than the equivalent dense interpolation matmuls at 28-64 px)
    and to the gather formulation for large ones (dense cost grows as
    H·W·(H+W)).
    """
    if images.shape[1] * images.shape[2] <= 64 * 64:
        return _affine_grid_sample_matmul(images, inv_mats)
    return _affine_grid_sample_gather(images, inv_mats)


def _affine_grid_sample_matmul(
    images: jnp.ndarray, inv_mats: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear warp as two dense tensor contractions (MXU-friendly).

    out[b,y,x,c] = Σ_s Σ_t wy[b,y,x,s] · wx[b,y,x,t] · img[b,s,t,c] with
    hat-function weights w = max(0, 1 − |src − index|): mathematically
    identical to 4-neighbor bilinear interpolation with zero fill (weights
    vanish outside the valid range), but runs on the MXU instead of the
    TPU's slow scatter/gather path — ~50× faster at 28×28.
    """
    b, h, w, c = images.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()]).astype(jnp.float32)
    src = jnp.einsum("bij,jk->bik", inv_mats, coords)  # [B, 2, H*W]
    sx = src[:, 0].reshape(b, h, w)
    sy = src[:, 1].reshape(b, h, w)

    row_idx = jnp.arange(h, dtype=jnp.float32)
    col_idx = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - row_idx))  # [B,H,W,H]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - col_idx))  # [B,H,W,W]

    # bf16 contractions: interpolation weights are in [0, 1] and pixel data
    # has 8 significant bits — bf16 halves the dominant HBM traffic of the
    # weight tensors with no visible quality impact (augmentation path only).
    imgs = images.astype(jnp.bfloat16)
    tmp = jnp.einsum(
        "byxs,bstc->byxtc", wy.astype(jnp.bfloat16), imgs,
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "byxt,byxtc->byxc", wx.astype(jnp.bfloat16), tmp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out


def _affine_grid_sample_gather(
    images: jnp.ndarray, inv_mats: jnp.ndarray
) -> jnp.ndarray:
    """Gather-based bilinear warp (general path for large images)."""
    b, h, w, c = images.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    # [3, H*W] homogeneous output coordinates (x, y, 1).
    coords = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()]).astype(jnp.float32)
    # [B, 2, H*W] input coordinates.
    src = jnp.einsum("bij,jk->bik", inv_mats, coords)
    sx, sy = src[:, 0], src[:, 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = images.reshape(b, h * w, c).astype(jnp.float32)
        vals = jnp.take_along_axis(flat, (yc * w + xc)[..., None], axis=1)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out.reshape(b, h, w, c)


def _nearest_grid_sample_matmul(
    images: jnp.ndarray, inv_mats: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-neighbor warp as two dense tensor contractions (MXU-friendly).

    Same contraction structure as :func:`_affine_grid_sample_matmul` but with
    indicator weights on the rounded source coordinate — the torchvision /
    PIL default interpolation for RandomRotation / RandomAffine. Out-of-range
    coordinates get all-zero weights (zero fill).
    """
    b, h, w, c = images.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()]).astype(jnp.float32)
    src = jnp.einsum("bij,jk->bik", inv_mats, coords)  # [B, 2, H*W]
    sx = src[:, 0].reshape(b, h, w)
    sy = src[:, 1].reshape(b, h, w)

    row_idx = jnp.arange(h, dtype=jnp.float32)
    col_idx = jnp.arange(w, dtype=jnp.float32)
    ry = jnp.floor(sy + 0.5)[..., None]  # round-half-up source row
    rx = jnp.floor(sx + 0.5)[..., None]
    wy = (row_idx == ry).astype(jnp.bfloat16)  # [B,H,W,H] one-hot (or zero)
    wx = (col_idx == rx).astype(jnp.bfloat16)  # [B,H,W,W]

    # Indicator one-hot weights: the contraction copies exact pixel values
    # (bf16 carries uint8 data exactly — 8 significant bits).
    imgs = images.astype(jnp.bfloat16)
    tmp = jnp.einsum(
        "byxs,bstc->byxtc", wy, imgs, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "byxt,byxtc->byxc", wx, tmp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out


def _random_affine_inverse(key: jax.Array, batch: int, h: int, w: int) -> jnp.ndarray:
    """Per-sample inverse affine matrices for flip+rotate+translate+scale."""
    k_flip, k_rot, k_tx, k_ty, k_scale = jax.random.split(key, 5)
    flip = jax.random.bernoulli(k_flip, 0.5, (batch,))
    theta = jax.random.uniform(
        k_rot, (batch,), minval=-ROTATION_DEGREES, maxval=ROTATION_DEGREES
    ) * (jnp.pi / 180.0)
    tx = jax.random.uniform(k_tx, (batch,), minval=-TRANSLATE_FRAC, maxval=TRANSLATE_FRAC) * w
    ty = jax.random.uniform(k_ty, (batch,), minval=-TRANSLATE_FRAC, maxval=TRANSLATE_FRAC) * h
    scale = jax.random.uniform(
        k_scale, (batch,), minval=SCALE_RANGE[0], maxval=SCALE_RANGE[1]
    )

    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    dx0 = -cx - tx
    dy0 = -cy - ty
    # Inverse of [scale·R(θ) about center, then translate t]:
    #   src = R(-θ)/s · (dst - c - t) + c
    # For forward R(θ) = [cos, -sin; sin, cos], the inverse rotation rows are
    # [cos, sin; -sin, cos] (scaled by 1/s).
    r00 = jnp.cos(theta) / scale
    r01 = jnp.sin(theta) / scale
    r10, r11 = -r01, r00
    t0 = r00 * dx0 + r01 * dy0 + cx
    t1 = r10 * dx0 + r11 * dy0 + cy
    # Horizontal flip composed in source space: x -> (w-1) - x.
    f00 = jnp.where(flip, -r00, r00)
    f01 = jnp.where(flip, -r01, r01)
    ft0 = jnp.where(flip, (w - 1) - t0, t0)
    return jnp.stack(
        [
            jnp.stack([f00, f01, ft0], axis=-1),
            jnp.stack([r10, r11, t1], axis=-1),
        ],
        axis=1,
    )


def _draw_factors(
    k_b: jax.Array, k_c: jax.Array, k_s: jax.Array, b: int
) -> tuple[jnp.ndarray, ...]:
    """The frozen jitter-factor distributions, from pre-split keys."""
    fb = jax.random.uniform(k_b, (b,), minval=1 - BRIGHTNESS, maxval=1 + BRIGHTNESS)
    fc = jax.random.uniform(k_c, (b,), minval=1 - CONTRAST, maxval=1 + CONTRAST)
    fs = jax.random.uniform(k_s, (b,), minval=1 - SATURATION, maxval=1 + SATURATION)
    return fb, fc, fs


def _jitter_factors(key: jax.Array, b: int) -> tuple[jnp.ndarray, ...]:
    """Per-sample (brightness, contrast, saturation) factors, each [B]
    (fixed-order recipe: 3-way key split, a frozen parity contract)."""
    return _draw_factors(*jax.random.split(key, 3), b)


def _color_jitter(key: jax.Array, x: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """Brightness/contrast(/saturation) jitter on [0,1] floats.

    torchvision semantics: factor ~ U[1-j, 1+j]; brightness scales pixels,
    contrast blends with the mean grayscale value, saturation blends with the
    per-pixel grayscale (RGB only). Applied in fixed order (the reference
    shuffles order per sample; statistically equivalent for these strengths).
    """
    b = x.shape[0]
    k_b, k_c, k_s = jax.random.split(key, 3)
    fb = jax.random.uniform(k_b, (b, 1, 1, 1), minval=1 - BRIGHTNESS, maxval=1 + BRIGHTNESS)
    fc = jax.random.uniform(k_c, (b, 1, 1, 1), minval=1 - CONTRAST, maxval=1 + CONTRAST)

    x = jnp.clip(x * fb, 0.0, 1.0)
    if num_channels == 3:
        gray = (
            0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
        )
        mean_gray = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
        x = jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 1.0)
        fs = jax.random.uniform(
            k_s, (b, 1, 1, 1), minval=1 - SATURATION, maxval=1 + SATURATION
        )
        x = jnp.clip((x - gray) * fs + gray, 0.0, 1.0)
    else:
        mean_gray = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 1.0)
    return x


# Six permutations of (brightness, contrast, saturation) — torchvision's
# ColorJitter applies its ops in a per-image random order.
_JITTER_PERMS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
    dtype=np.int32,
)


def _jitter_params(
    key: jax.Array, b: int, num_channels: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shuffled-jitter params: factors [B, 3] and per-stage opcodes [B, 3].

    The factor distributions are shared with :func:`_jitter_factors` via
    :func:`_draw_factors` (a frozen parity contract — so is this function's
    4-way key split); only the op-order permutation is extra.
    """
    k_b, k_c, k_s, k_p = jax.random.split(key, 4)
    fb, fc, fs = _draw_factors(k_b, k_c, k_s, b)
    perm = jnp.asarray(_JITTER_PERMS)[jax.random.randint(k_p, (b,), 0, 6)]
    return jnp.stack([fb, fc, fs], axis=1), perm


def _color_jitter_shuffled(
    key: jax.Array, x: jnp.ndarray, num_channels: int
) -> jnp.ndarray:
    """torchvision-faithful ColorJitter: per-sample random op order.

    Factors: brightness/contrast ~ U[0.8, 1.2], saturation ~ U[0.9, 1.1]
    (RGB only — torchvision passes saturation=0 for grayscale, i.e. skip).
    Each op matches torchvision's tensor semantics: brightness scales,
    contrast blends with the mean grayscale value of the *current* image,
    saturation blends with the per-pixel grayscale; clamp after each op.
    """
    b = x.shape[0]
    factors, perm = _jitter_params(key, b, num_channels)
    fb = factors[:, 0].reshape(b, 1, 1, 1)
    fc = factors[:, 1].reshape(b, 1, 1, 1)
    fs = factors[:, 2].reshape(b, 1, 1, 1)

    def brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def grayscale(x):
        if num_channels == 3:
            return 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
        return x

    def contrast(x):
        mean_gray = jnp.mean(grayscale(x), axis=(1, 2, 3), keepdims=True)
        return jnp.clip((x - mean_gray) * fc + mean_gray, 0.0, 1.0)

    def saturation(x):
        if num_channels != 3:
            return x
        gray = grayscale(x)
        return jnp.clip((x - gray) * fs + gray, 0.0, 1.0)

    for stage in range(3):
        op = perm[:, stage][:, None, None, None]  # [B,1,1,1]
        xb, xc, xs_ = brightness(x), contrast(x), saturation(x)
        x = jnp.where(op == 0, xb, jnp.where(op == 1, xc, xs_))
    return x


def _ref_warp_mats(key: jax.Array, b: int, h: int, w: int):
    """Per-sample (rot, aff) inverse 2x3 matrices for the torchvision recipe.

    Sampling order/distributions are frozen (they define the adopted
    torchvision-faithful recipe): flip folded into the rotation matrix,
    rotation ±15° about center, then a second affine with integer-pixel
    translation ±10% and scale 0.9–1.1 about center.
    """
    k_flip, k_rot, k_affine, k_color = jax.random.split(key, 4)
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0

    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    theta = jax.random.uniform(
        k_rot, (b,), minval=-ROTATION_DEGREES, maxval=ROTATION_DEGREES
    ) * (jnp.pi / 180.0)
    r00 = jnp.cos(theta)
    r01 = jnp.sin(theta)
    t0 = r00 * (-cx) + r01 * (-cy) + cx
    t1 = -r01 * (-cx) + r00 * (-cy) + cy
    f00 = jnp.where(flip, -r00, r00)
    f01 = jnp.where(flip, -r01, r01)
    ft0 = jnp.where(flip, (w - 1) - t0, t0)
    rot = jnp.stack(
        [
            jnp.stack([f00, f01, ft0], axis=-1),
            jnp.stack([-r01, r00, t1], axis=-1),
        ],
        axis=1,
    )

    k_tx, k_ty, k_scale = jax.random.split(k_affine, 3)
    tx = jnp.round(
        jax.random.uniform(k_tx, (b,), minval=-TRANSLATE_FRAC, maxval=TRANSLATE_FRAC) * w
    )
    ty = jnp.round(
        jax.random.uniform(k_ty, (b,), minval=-TRANSLATE_FRAC, maxval=TRANSLATE_FRAC) * h
    )
    scale = jax.random.uniform(
        k_scale, (b,), minval=SCALE_RANGE[0], maxval=SCALE_RANGE[1]
    )
    inv_s = 1.0 / scale
    at0 = inv_s * (-cx - tx) + cx
    at1 = inv_s * (-cy - ty) + cy
    zeros = jnp.zeros_like(inv_s)
    aff = jnp.stack(
        [
            jnp.stack([inv_s, zeros, at0], axis=-1),
            jnp.stack([zeros, inv_s, at1], axis=-1),
        ],
        axis=1,
    )
    return rot, aff, k_color


def composed_nearest_coords(
    rot: jnp.ndarray, aff: jnp.ndarray, h: int, w: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Source coords for two composed nearest-neighbor warps, in ONE pass.

    Two nearest warps compose exactly: ``out[p] = I1[round(aff·p)]`` with
    ``I1[q] = I[round(rot·q)]`` gives ``out[p] = I[round(rot·round(aff·p))]``
    — the intermediate image is only ever sampled at integer coordinates, so
    skipping its materialization loses nothing. Out-of-range intermediate
    coordinates (where pass 1's output is zero fill) are masked via
    ``valid``. Returns (sx, sy, valid), each [B, H, W].
    """
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()]).astype(jnp.float32)
    src2 = jnp.einsum("bij,jk->bik", aff, coords)  # [B, 2, H*W]
    qx = jnp.floor(src2[:, 0] + 0.5)
    qy = jnp.floor(src2[:, 1] + 0.5)
    valid = (qx >= 0) & (qx < w) & (qy >= 0) & (qy < h)
    sx = rot[:, 0, 0:1] * qx + rot[:, 0, 1:2] * qy + rot[:, 0, 2:3]
    sy = rot[:, 1, 0:1] * qx + rot[:, 1, 1:2] * qy + rot[:, 1, 2:3]
    return (
        sx.reshape(-1, h, w),
        sy.reshape(-1, h, w),
        valid.reshape(-1, h, w),
    )


def _nearest_sample_from_coords(
    images: jnp.ndarray,
    sx: jnp.ndarray,
    sy: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Nearest-neighbor sample at per-pixel source coords (matmul form)."""
    b, h, w, c = images.shape
    row_idx = jnp.arange(h, dtype=jnp.float32)
    col_idx = jnp.arange(w, dtype=jnp.float32)
    ry = jnp.floor(sy + 0.5)[..., None]
    rx = jnp.floor(sx + 0.5)[..., None]
    wy = ((row_idx == ry) & valid[..., None]).astype(jnp.bfloat16)
    wx = (col_idx == rx).astype(jnp.bfloat16)
    imgs = images.astype(jnp.bfloat16)
    tmp = jnp.einsum(
        "byxs,bstc->byxtc", wy, imgs, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "byxt,byxtc->byxc", wx, tmp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("num_channels", "mesh", "out_dtype")
)
def train_augment_ref(
    images: jnp.ndarray, key: jax.Array, num_channels: int = 3, mesh=None,
    out_dtype=None, indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference-faithful train augmentation (torchvision two-pass semantics).

    Matches /root/reference/vision_spectra/data/transforms.py:10-55 op for op:

    - RandomHorizontalFlip(0.5) — exact mirror, folded into the first warp
      (mirrors map pixel centers to pixel centers, so composing it with a
      nearest-neighbor warp is exact),
    - RandomRotation(±15°) with **nearest-neighbor** resampling (the
      torchvision default), zero fill,
    - RandomAffine(translate ±10% **rounded to integer pixels**, scale
      0.9–1.1) as a second nearest-neighbor warp — torchvision resamples
      twice, but two nearest warps compose exactly (the intermediate is only
      sampled at integer coordinates), so this runs as ONE resample via
      :func:`composed_nearest_coords` — bit-identical output at half the cost,
    - ColorJitter with per-sample random op order,
    - normalize.

    The default :func:`train_augment` composes everything into one bilinear
    warp — smoother; this variant is the adopted default recipe
    (``DatasetConfig.aug_mode="torchvision"``) after the 10-seed accuracy A/B.
    On TPU the whole pipeline runs as a single Pallas kernel
    (ops/aug_warp.py) that keeps every intermediate in VMEM.
    """
    _, h, w, c = images.shape
    b = indices.shape[0] if indices is not None else images.shape[0]
    rot, aff, k_color = _ref_warp_mats(key, b, h, w)

    from vision_spectra_tpu.ops.aug_warp import use_pallas_warp, warp_augment

    if use_pallas_warp((b, h, w, c), mesh):
        factors, opcodes = _jitter_params(k_color, b, num_channels)
        mean, std = _stats(num_channels)
        return warp_augment(
            images, rot, aff, factors, opcodes, mean, std,
            num_channels=num_channels, bilinear=False, mesh=mesh,
            out_dtype=out_dtype, gather_indices=indices,
        )

    if indices is not None:
        images = jnp.take(images, indices, axis=0)
    x = images.astype(jnp.float32) / 255.0
    sx, sy, valid = composed_nearest_coords(rot, aff, h, w)
    x = _nearest_sample_from_coords(x, sx, sy, valid)
    x = _color_jitter_shuffled(k_color, x, num_channels)
    mean, std = _stats(num_channels)
    out = (x - mean) / std
    return out.astype(out_dtype) if out_dtype is not None else out


def _train_augment_ref_twopass(
    images: jnp.ndarray, key: jax.Array, num_channels: int = 3
) -> jnp.ndarray:
    """Literal two-resample variant (parity oracle for the composed path)."""
    b, h, w, _ = images.shape
    rot, aff, k_color = _ref_warp_mats(key, b, h, w)
    x = images.astype(jnp.float32) / 255.0
    x = _nearest_grid_sample_matmul(x, rot)
    x = _nearest_grid_sample_matmul(x, aff)
    x = _color_jitter_shuffled(k_color, x, num_channels)
    mean, std = _stats(num_channels)
    return (x - mean) / std


@functools.partial(
    jax.jit, static_argnames=("num_channels", "mesh", "out_dtype")
)
def train_augment(
    images: jnp.ndarray, key: jax.Array, num_channels: int = 3, mesh=None,
    out_dtype=None, indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full train-time augmentation: warp + color jitter + normalize.

    On TPU the whole pipeline (bilinear warp + fixed-order jitter +
    normalize) runs as one Pallas kernel (ops/aug_warp.py); elsewhere as the
    XLA matmul-warp formulation. Both consume the same sampled parameters.
    """
    _, h, w, c = images.shape
    b = indices.shape[0] if indices is not None else images.shape[0]
    k_affine, k_color = jax.random.split(key)
    inv = _random_affine_inverse(k_affine, b, h, w)

    from vision_spectra_tpu.ops.aug_warp import use_pallas_warp, warp_augment

    if use_pallas_warp((b, h, w, c), mesh):
        fb, fc, fs = _jitter_factors(k_color, b)
        mean, std = _stats(num_channels)
        return warp_augment(
            images, inv, None, jnp.stack([fb, fc, fs], axis=1), None,
            mean, std, num_channels=num_channels, bilinear=True, mesh=mesh,
            out_dtype=out_dtype, gather_indices=indices,
        )

    if indices is not None:
        images = jnp.take(images, indices, axis=0)
    x = images.astype(jnp.float32) / 255.0
    x = _affine_grid_sample(x, inv)
    x = _color_jitter(k_color, x, num_channels)
    mean, std = _stats(num_channels)
    out = (x - mean) / std
    return out.astype(out_dtype) if out_dtype is not None else out


@functools.partial(jax.jit, static_argnames=("num_channels", "out_dtype"))
def mim_augment(
    images: jnp.ndarray, key: jax.Array, num_channels: int = 3,
    out_dtype=None, indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MIM augmentation: horizontal flip only + normalize (transforms.py:85)."""
    if indices is not None:
        images = jnp.take(images, indices, axis=0)
    b = images.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (b, 1, 1, 1))
    x = images.astype(jnp.float32) / 255.0
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    mean, std = _stats(num_channels)
    out = (x - mean) / std
    return out.astype(out_dtype) if out_dtype is not None else out


@functools.partial(jax.jit, static_argnames=("num_channels",))
def eval_transform(images: jnp.ndarray, num_channels: int = 3) -> jnp.ndarray:
    """Eval: normalization only."""
    return normalize(images, num_channels)


def make_augment_fn(
    num_channels: int, mode: str = "train", mesh=None, out_dtype=None
) -> Callable[[jnp.ndarray, jax.Array], jnp.ndarray]:
    """Factory returning the right (images, key) -> images function.

    ``mesh`` (optional) lets the train-time Pallas warp kernel run per-shard
    under ``shard_map`` on multi-device meshes; the random parameter draws
    keep global-batch semantics either way. ``out_dtype`` (train modes only)
    lets bf16-compute models take bf16 inputs straight from the augmentation
    kernel — numerically identical (the model casts at its first matmul),
    half the activation traffic.
    """
    if mode == "train":
        return functools.partial(
            train_augment, num_channels=num_channels, mesh=mesh,
            out_dtype=out_dtype,
        )
    if mode == "train_ref":
        return functools.partial(
            train_augment_ref, num_channels=num_channels, mesh=mesh,
            out_dtype=out_dtype,
        )
    if mode == "mim":
        return functools.partial(mim_augment, num_channels=num_channels)
    if mode == "eval":
        return lambda images, key=None: eval_transform(images, num_channels=num_channels)
    raise ValueError(f"unknown transform mode: {mode}")
