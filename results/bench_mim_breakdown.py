"""MIM patch-4 per-step breakdown (TPU) — where do the 166 ms go?

Round-5 follow-on to the 49.4k img/s / 13.8% MFU bench line: attributes the
MIM production step (f32 aug + masked encoder + decoder + masked-MSE +
AdamW) so the next optimization target is measured, not guessed. Prime
suspect: the 2 decoder blocks run as plain XLA blocks ([B, 49, 128]) while
the encoder rides the fused Pallas kernel.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_mim_breakdown.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_p4_breakdown import BATCH, timed  # noqa: E402


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"MIM breakdown platform={platform} (B{BATCH})", flush=True)

    from vision_spectra_tpu.config import OptimizerConfig
    from vision_spectra_tpu.data.transforms import mim_augment
    from vision_spectra_tpu.models import MIMModel, build_vit
    from vision_spectra_tpu.training.state import (
        TrainState,
        apply_updates,
        make_optimizer,
    )

    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(BATCH, 28, 28, 3), dtype=np.uint8))
    model_p4, _ = build_vit("vit_tiny_patch4_28", num_classes=9,
                            num_channels=3, image_size=28,
                            drop_path_rate=0.1, dtype=dtype)
    mim = MIMModel(encoder=model_p4, decoder_embed_dim=128, decoder_depth=2,
                   decoder_num_heads=4, mask_ratio=0.75, dtype=dtype)
    sample = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = mim.init({"params": jax.random.key(0),
                       "mask": jax.random.key(1)}, sample, 0.75)["params"]
    tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
    state = TrainState.create(params, tx)
    lr = jnp.float32(1e-4)

    @jax.jit
    def full_step(state, imgs, key):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        x = mim_augment(imgs, k_aug, num_channels=3)

        def closs(p):
            loss, _pred, _mask = mim.apply(
                {"params": p}, x, 0.75, deterministic=False,
                rngs={"dropout": k_drop, "mask": k_mask})
            return loss

        loss, grads = jax.value_and_grad(closs)(state.params)
        return apply_updates(state, grads, tx, lr, None), loss

    def full_it(key=jax.random.key(1)):
        _, loss = full_step(state, images_u8, key)
        return loss

    ms = timed("full MIM step (aug+fwd/bwd+opt)", full_it)
    if np.isfinite(ms):
        from bench import mim_train_flops_per_image
        flops = BATCH * mim_train_flops_per_image()
        print(f"      -> {BATCH / (ms / 1e3):,.0f} img/s/chip, "
              f"{flops / (ms / 1e3) / 197e12 * 100:.1f}% MFU", flush=True)

    # Aug alone (f32 MIM policy).
    aug_fn = jax.jit(lambda i, k: mim_augment(i, k, num_channels=3))
    timed("mim aug (f32 out)", aug_fn, images_u8, jax.random.key(2))
    x_aug = aug_fn(images_u8, jax.random.key(3))

    # Model fwd+bwd (no aug/opt).
    @jax.jit
    def model_fwdbwd(p, x, key):
        k_drop, k_mask = jax.random.split(key)

        def closs(p):
            loss, _pred, _mask = mim.apply(
                {"params": p}, x, 0.75, deterministic=False,
                rngs={"dropout": k_drop, "mask": k_mask})
            return loss

        return jax.value_and_grad(closs)(p)

    timed("model fwd+bwd", model_fwdbwd, state.params, x_aug,
          jax.random.key(4))

    # Decoder isolated: latents [B, 13, 192] + ids_restore -> pred; fwd+bwd.
    from vision_spectra_tpu.models.mim import MIMDecoder

    lat = jnp.asarray(rng.randn(BATCH, 13, 192), dtype)
    ids = jnp.asarray(
        np.stack([rng.permutation(49) for _ in range(BATCH)]), jnp.int32)
    dpos = jnp.asarray(rng.randn(1, 50, 128).astype(np.float32) * 0.02)
    dparams = None
    for tag, fused in (("XLA", False), ("fused kernel", True)):
        dec = MIMDecoder(encoder_embed_dim=192, decoder_embed_dim=128,
                         decoder_depth=2, decoder_num_heads=4, patch_size=4,
                         num_channels=3, dtype=dtype,
                         use_fused_blocks=fused)
        if dparams is None:
            dparams = dec.init(jax.random.key(0), lat, ids, dpos)["params"]

        @jax.jit
        def dec_fwdbwd(p, lat, ids, dec=dec):
            def closs(p):
                pred = dec.apply({"params": p}, lat, ids, dpos)
                return jnp.sum(pred.astype(jnp.float32) ** 2) * 1e-6

            return jax.value_and_grad(closs)(p)

        timed(f"decoder alone fwd+bwd (2 {tag} blocks, N=49 E=128)",
              dec_fwdbwd, dparams, lat, ids)

    # Encoder on 13 visible tokens alone (the fused-kernel portion).
    from vision_spectra_tpu.ops.block_fused import fused_vit_block, select_tile

    n13 = 13
    rows13 = BATCH * n13
    x13 = jnp.asarray(rng.randn(rows13, 192), dtype)
    ones13 = jnp.ones((rows13, 1), jnp.float32)
    from bench_p4_breakdown import DEPTH, block_params

    plist = tuple(block_params(k)
                  for k in jax.random.split(jax.random.key(7), DEPTH))

    def enc_loss(x, pl):
        h = x
        for p in pl:
            h = fused_vit_block(h, p, ones13, ones13, num_heads=3,
                                n_tokens=n13)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    g13 = jax.jit(jax.value_and_grad(enc_loss, argnums=(0, 1)))

    def enc_it():
        loss, _ = g13(x13, plist)
        return loss

    timed("encoder 12-block stack fwd+bwd (fused, N=13)", enc_it)
    print(f"  (select_tile(13): {select_tile(rows13, 13)})", flush=True)


if __name__ == "__main__":
    main()
