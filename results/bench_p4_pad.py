"""Sublane token-padding (VST_MIDN_PAD) A/B on the patch-4 geometries (TPU).

Round-5 MFU item (VERDICT r4 next #1a): N=50 (patch-4) and N=13 (MIM
visible) are sublane-misaligned — every per-image/group slice inside the
fused block kernel starts at a non-multiple-of-8 row offset, forcing Mosaic
relayout copies around each attention dot. ``padded_tokens`` pads each
image's token rows to the next multiple of 8 (50 -> 56, 13 -> 16), masking
dummy keys in-kernel, at the cost of n_pad/n extra rows through the
non-attention matmuls (+12% at N=50, +23% at N=13).

Measures, pad off vs on:
  [1] the 12-block fused stack fwd+bwd at N=50 (pad+slice INSIDE the jit so
      the padded case pays its real layout cost) — group2+savep default and
      recompute backward;
  [2] the same at N=13 group4;
  [3] the full production train step (aug + model fwd/bwd + AdamW) at the
      patch-4 flagship config via VST_MIDN_PAD, with img/s and MFU.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_p4_pad.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_p4_breakdown import (  # noqa: E402
    BATCH,
    DEPTH,
    E,
    HEADS,
    block_params,
    timed,
)
from vision_spectra_tpu.ops.block_fused import fused_vit_block  # noqa: E402

_KNOBS = ("VST_MIDN_MASKED", "VST_MIDN_TILE_ROWS", "VST_MIDN_BATCHED",
          "VST_MIDN_ATTNOFF", "VST_MIDN_GROUP", "VST_P4_HYBRID",
          "VST_MIDN_SAVEP", "VST_MIDN_PAD")

# v5e bf16 peak (MXU), used for the full-step MFU line (bench.py value).
PEAK_TFLOPS = 197.0


def _set_env(env):
    for k in _KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)


def stack_fn(n_real: int, pad: bool, env: dict):
    """Jitted 12-block stack fwd+bwd over [BATCH, n_real, E] input; the
    padded variant pads/slices inside the jit (its real cost)."""
    _set_env(env)
    from vision_spectra_tpu.ops.block_fused import padded_tokens

    n = padded_tokens(n_real) if pad else n_real
    rows = BATCH * n
    ones = jnp.ones((rows, 1), jnp.float32)

    def loss(x, plist):
        h = x.reshape(BATCH, n_real, E)
        if n != n_real:
            h = jnp.pad(h, ((0, 0), (0, n - n_real), (0, 0)))
        h = h.reshape(rows, E)
        for p in plist:
            h = fused_vit_block(h, p, ones, ones, num_heads=HEADS,
                                n_tokens=n, n_real=n_real)
        h = h.reshape(BATCH, n, E)
        if n != n_real:
            h = h[:, :n_real]
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1))), n


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"pad A/B platform={platform} (B{BATCH} E{E} H{HEADS} "
          f"depth{DEPTH})", flush=True)
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    plist = tuple(block_params(k) for k in jax.random.split(jax.random.key(7),
                                                            DEPTH))

    for n_real, group_note in ((50, "group2"), (13, "group4")):
        x = jnp.asarray(rng.randn(BATCH * n_real, E), dtype)
        print(f"\n[N={n_real}] 12-block stack fwd+bwd ({group_note} default)",
              flush=True)
        for tag, pad, env in [
            ("pad off, savep (shipped r4)", False, {"VST_MIDN_PAD": "0"}),
            ("pad on,  savep", True, {"VST_MIDN_PAD": "1"}),
            ("pad off, recompute", False,
             {"VST_MIDN_PAD": "0", "VST_MIDN_SAVEP": "0"}),
            ("pad on,  recompute", True,
             {"VST_MIDN_PAD": "1", "VST_MIDN_SAVEP": "0"}),
        ]:
            fn, n = stack_fn(n_real, pad, env)

            def it(fn=fn):
                loss, _ = fn(x, plist)
                return loss

            timed(f"stack [{tag}] n={n}", it)

    # [3] Full production step via the model path (VST_MIDN_PAD read by
    # models/vit.py at trace time).
    import functools

    from vision_spectra_tpu.config import OptimizerConfig
    from vision_spectra_tpu.data.transforms import train_augment
    from vision_spectra_tpu.losses import make_cross_entropy
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.training.state import (
        TrainState,
        apply_updates,
        make_optimizer,
    )

    aug_dt = jnp.bfloat16 if platform == "tpu" else None
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

    # fwd+bwd model FLOPs at the real (unpadded) geometry — padding does no
    # useful extra math, so MFU is credited against real-token FLOPs, with
    # bench.py's exact convention for comparability.
    sys.path.insert(0, "/root/repo")
    from bench import vit_train_flops_per_image

    flops = BATCH * vit_train_flops_per_image(50, E, DEPTH, patch=4)

    print("\n[3] full production step (aug + fwd/bwd + AdamW)", flush=True)
    for tag, env in [("pad off (shipped r4)", {"VST_MIDN_PAD": "0"}),
                     ("pad on", {"VST_MIDN_PAD": "1"})]:
        _set_env(env)

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

        def it(full_step=full_step, key=jax.random.key(1)):
            _, loss = full_step(state, images_u8, labels, key)
            return loss

        ms = timed(f"full step [{tag}]", it)
        if np.isfinite(ms):
            imgs_s = BATCH / (ms / 1e3)
            mfu = flops / (ms / 1e3) / (PEAK_TFLOPS * 1e12) * 100
            print(f"      -> {imgs_s:,.0f} img/s/chip, {mfu:.1f}% MFU",
                  flush=True)
    _set_env({})


if __name__ == "__main__":
    main()
