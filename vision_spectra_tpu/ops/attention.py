"""Multi-head attention ops.

Two execution paths:

- **XLA path** (default): plain einsum softmax einsum. For the sequence
  lengths this framework trains at (2–197 tokens) XLA fuses this into a
  handful of MXU ops and nothing faster exists.
- **Pallas flash path** (``use_flash=True``): blockwise streaming-softmax
  kernel (ops/flash_attention.py) that never materializes the [N, N] score
  matrix, with a custom-VJP Pallas backward. Profitable from N = 512
  (measured crossover sweep at product shapes, results/RESULTS.md
  "Flash/XLA crossover": XLA wins 2.3× at N = 197/256, flash wins 1.35×
  at N = 512, 1.55× at N = 1024 [H=3, d=64], and scales to 2.0× at
  N = 4096 [H=12]).

The reference computes attention inside timm / nn.MultiheadAttention
(reference: vision_spectra/models/vit.py:160-168, models/mim.py:153).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Measured flash/XLA fwd+bwd crossover on v5e (results/RESULTS.md
# "Flash/XLA crossover", round 4): XLA 2.3x faster at N=197/256, flash
# 1.35x faster at N=512 and 1.55x at N=1024. The dispatcher flips here.
FLASH_MIN_SEQ = 512


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, N, D] tensors.

    Returns [B, H, N, D]. Softmax is computed in float32 regardless of input
    dtype (bf16-safe), output is cast back to the input dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # Flash path covers training too (custom VJP with Pallas backward
    # kernels); attention dropout is the only feature it lacks, so fall back
    # to the XLA path when dropout is actually active. Threshold from the
    # TPU v5e crossover sweep at product sequence lengths
    # (results/bench_p4_breakdown.py [3]; table in results/RESULTS.md):
    # fwd+bwd, XLA wins 2.3x at N=197/256, flash wins from N=512 (1.35x)
    # through N=1024 (1.55x) and scales to 2x at N=4096.
    if use_flash and q.shape[-2] >= FLASH_MIN_SEQ and (deterministic or dropout_rate == 0.0):
        from vision_spectra_tpu.ops.flash_attention import flash_mha

        return flash_mha(q, k, v, scale=scale)

    dtype = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, scale: float | None = None) -> jnp.ndarray:
    """Softmax attention maps [B, H, N, N] (for visualization/introspection)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    return jax.nn.softmax(scores, axis=-1)
