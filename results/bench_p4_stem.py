"""Stem (patch-embed) / head cost split at the patch-4 geometry (TPU).

Round-5 MFU item (VERDICT r4 next #1b): the round-4 breakdown attributed
23.5 ms (11% of the step) to "embed + head + final norm" by residual
(model - blocks). This probe measures the pieces directly:

  [1] full production step — now with the slice-before-final-norm
      classification path (models/vit.py __call__), vs the r4 213.6 ms;
  [2] embed() alone fwd+bwd (patchify reshape/transpose + [48,192] matmul
      + CLS concat + pos add);
  [3] final-norm+head on CLS only (the new path) vs on all 50 tokens (the
      old path), fwd+bwd;
  [4] embed variant: patchify folded to [B*49, 48] rows on the HOST side
      of the matmul (flat dot, no 6-D transpose) — isolates the transpose
      cost from the matmul.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_p4_stem.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_p4_breakdown import BATCH, DEPTH, E, timed  # noqa: E402


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"stem probe platform={platform} (B{BATCH} E{E} depth{DEPTH})",
          flush=True)

    from vision_spectra_tpu.config import OptimizerConfig
    from vision_spectra_tpu.data.transforms import train_augment
    from vision_spectra_tpu.losses import make_cross_entropy
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training.state import (
        TrainState,
        apply_updates,
        make_optimizer,
    )

    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    aug_dt = jnp.bfloat16 if platform == "tpu" else None
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(BATCH, 28, 28, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.randint(0, 9, size=BATCH).astype(np.int32))
    model, _ = build_vit("vit_tiny_patch4_28", num_classes=9, num_channels=3,
                         image_size=28, drop_path_rate=0.1, dtype=dtype)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 28, 28, 3), jnp.float32))["params"]
    tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
    state = TrainState.create(params, tx)
    loss_fn = make_cross_entropy()
    lr = jnp.float32(1e-4)

    print("\n[1] full production step (slice-before-norm __call__)",
          flush=True)

    @jax.jit
    def full_step(state, imgs, labs, key):
        k_aug, k_drop = jax.random.split(key)
        x = train_augment(imgs, k_aug, num_channels=3, out_dtype=aug_dt)

        def closs(p):
            logits = model.apply({"params": p}, x, deterministic=False,
                                 rngs={"dropout": k_drop})
            return loss_fn(logits, labs)

        loss, grads = jax.value_and_grad(closs)(state.params)
        return apply_updates(state, grads, tx, lr, None), loss

    def full_it(key=jax.random.key(1)):
        _, loss = full_step(state, images_u8, labels, key)
        return loss

    ms = timed("full step (aug+fwd+bwd+opt)", full_it)
    if np.isfinite(ms):
        from bench import vit_train_flops_per_image
        flops = BATCH * vit_train_flops_per_image(50, E, DEPTH, patch=4)
        print(f"      -> {BATCH / (ms / 1e3):,.0f} img/s/chip, "
              f"{flops / (ms / 1e3) / 197e12 * 100:.1f}% MFU", flush=True)

    print("\n[2] embed() alone fwd+bwd", flush=True)
    aug_fn = jax.jit(lambda i, k: train_augment(i, k, num_channels=3,
                                                out_dtype=aug_dt))
    x_aug = aug_fn(images_u8, jax.random.key(3))

    @jax.jit
    def embed_fwdbwd(p, x):
        def closs(p):
            toks = model.apply({"params": p}, x, deterministic=True,
                               method="embed")
            return jnp.sum(toks.astype(jnp.float32) ** 2) * 1e-6

        return jax.value_and_grad(closs)(p)

    timed("embed (patchify+matmul+cls+pos)", embed_fwdbwd, state.params,
          x_aug)

    print("\n[3] final norm + head fwd+bwd", flush=True)
    toks = jnp.asarray(rng.randn(BATCH, 50, E), dtype)

    @jax.jit
    def head_cls(p, t, labs):
        def closs(p):
            import flax.linen as nn
            cls = t[:, 0]
            mu = jnp.mean(cls.astype(jnp.float32), -1, keepdims=True)
            var = jnp.var(cls.astype(jnp.float32), -1, keepdims=True)
            y = (cls.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-6)
            y = y * p["norm_out"]["scale"] + p["norm_out"]["bias"]
            logits = (y.astype(dtype) @ p["head"]["kernel"].astype(dtype)
                      + p["head"]["bias"].astype(dtype))
            return loss_fn(logits.astype(jnp.float32), labs)

        return jax.value_and_grad(closs)(p)

    timed("norm+head on CLS only", head_cls, state.params, toks, labels)

    @jax.jit
    def head_all(p, t, labs):
        def closs(p):
            tf = t.astype(jnp.float32)
            mu = jnp.mean(tf, -1, keepdims=True)
            var = jnp.var(tf, -1, keepdims=True)
            y = (tf - mu) * jax.lax.rsqrt(var + 1e-6)
            y = y * p["norm_out"]["scale"] + p["norm_out"]["bias"]
            logits = (y[:, 0].astype(dtype) @ p["head"]["kernel"].astype(dtype)
                      + p["head"]["bias"].astype(dtype))
            return loss_fn(logits.astype(jnp.float32), labs)

        return jax.value_and_grad(closs)(p)

    timed("norm(all 50 tokens) then head", head_all, state.params, toks,
          labels)

    print("\n[4] patchify/transpose cost isolation", flush=True)
    w = params["patch_embed"]["kernel"].astype(dtype)
    b_ = params["patch_embed"]["bias"].astype(dtype)
    x_flat = jnp.asarray(rng.randn(BATCH * 49, 48), dtype)

    @jax.jit
    def flat_embed(w, b_, xf):
        def closs(w):
            y = xf @ w.astype(dtype) + b_
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        return jax.value_and_grad(closs)(w)

    timed("flat [B*49,48]@[48,192] matmul only", flat_embed, w, b_, x_flat)

    @jax.jit
    def patchify_embed(w, b_, img):
        def closs(w):
            b, h, ww, c = img.shape
            p4 = 4
            x = img.reshape(b, 7, p4, 7, p4, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * 49, p4 * p4 * c)
            y = x @ w.astype(dtype) + b_
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        return jax.value_and_grad(closs)(w)

    timed("patchify transpose + matmul", patchify_embed, w, b_, x_aug)


if __name__ == "__main__":
    main()
