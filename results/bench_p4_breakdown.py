"""Patch-4 (50-token) per-step breakdown + flash/XLA crossover at product N.

VERDICT r3 items 2 and 6. Two question sets, one TPU session:

1. **Where does the patch-4 step spend its time?** Measures, at the
   vit_tiny_patch4_28 geometry (N=50 tokens, E=192, depth 12, batch 8192):
   the full fused train step, the augmentation kernel alone, the model
   fwd+bwd alone, the 12-block stack fwd+bwd alone (fused per-image /
   fused masked / plain XLA), the block stack forward-only, isolated
   head-batched XLA attention (the cost a split-kernel hybrid would pay),
   and the optimizer update alone. The residuals attribute the step:
   embed+head = model − blocks, step overhead = full − model − aug − opt.

2. **Where is the flash/XLA crossover at the N this product actually
   runs?** Sweeps mha XLA vs Pallas flash fwd+bwd at N = 50, 197, 256,
   512, 1024 with total tokens held at 409,600 (the patch-4 step's row
   count), H=3, d=64. The dispatch threshold in ops/attention.py cites
   this table.

Usage (TPU, single-tenant — nothing else attached):
    PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_p4_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = 8192
N = 50
E = 192
F = 768
HEADS = 3
DEPTH = 12
ROWS = BATCH * N


def sync(x) -> float:
    return float(np.asarray(jnp.reshape(x, (1,)))[0])


def timed(label: str, fn, *args, n_it: int = 5) -> float:
    """ms/iter, best of two windows, honest value-fetch sync.

    Returns NaN (and keeps going) if the config fails to compile/run —
    one pathological config must not cost the session its other numbers.
    """
    try:
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_it):
                out = fn(*args)
            sync(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
            best = min(best, (time.perf_counter() - t0) / n_it)
        ms = best * 1e3
        print(f"  {label:<42s} {ms:9.2f} ms", flush=True)
        return ms
    except Exception as exc:  # noqa: BLE001 — report and move on
        print(f"  {label:<42s}    FAILED ({type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:120]})", flush=True)
        return float("nan")


def block_params(key, scale=0.02):
    from vision_spectra_tpu.ops.block_fused import _param_shapes

    shapes = _param_shapes(E, F)
    ks = jax.random.split(key, len(shapes))
    return tuple(
        jax.random.normal(k, s, jnp.float32) * scale for k, s in zip(ks, shapes)
    )


def fused_stack_fn(midn_env: dict[str, str]):
    """Jitted 12-block fused-kernel stack fwd+bwd under the given env."""
    from vision_spectra_tpu.ops.block_fused import fused_vit_block

    for k in ("VST_MIDN_MASKED", "VST_MIDN_TILE_ROWS", "VST_MIDN_BATCHED",
              "VST_MIDN_ATTNOFF", "VST_MIDN_GROUP", "VST_P4_HYBRID",
              "VST_MIDN_SAVEP"):
        os.environ.pop(k, None)
    os.environ.update(midn_env)

    ones = jnp.ones((ROWS, 1), jnp.float32)

    def loss(x, params_list):
        h = x
        for p in params_list:
            h = fused_vit_block(h, p, ones, ones, num_heads=HEADS, n_tokens=N)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))


def fused_stack_fwd_fn():
    from vision_spectra_tpu.ops.block_fused import fused_vit_block

    ones = jnp.ones((ROWS, 1), jnp.float32)

    @jax.jit
    def fwd(x, params_list):
        h = x
        for p in params_list:
            h = fused_vit_block(h, p, ones, ones, num_heads=HEADS, n_tokens=N)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    return fwd


def xla_block(x3, p):
    """Plain-XLA pre-LN block on [B, N, E] (bf16 matmuls, f32 stats) — the
    unfused reference line."""
    from vision_spectra_tpu.ops.attention import mha

    (ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     ln2s, ln2b, w1, b1, w2, b2) = p
    d = E // HEADS

    def ln(h, s, bvec):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6) * s[0] + bvec[0]

    y = ln(x3, ln1s, ln1b)
    yb = y.astype(jnp.bfloat16)
    q = (yb @ wq.astype(jnp.bfloat16)).astype(jnp.float32) + bq[0]
    k = (yb @ wk.astype(jnp.bfloat16)).astype(jnp.float32) + bk[0]
    v = (yb @ wv.astype(jnp.bfloat16)).astype(jnp.float32) + bv[0]

    def heads(t):
        b, n, _ = t.shape
        return t.reshape(b, n, HEADS, d).transpose(0, 2, 1, 3).astype(jnp.bfloat16)

    ao = mha(heads(q), heads(k), heads(v), use_flash=False)
    b, n, _ = x3.shape
    ao = ao.transpose(0, 2, 1, 3).reshape(b, n, E)
    x3 = x3 + ((ao @ wp.astype(jnp.bfloat16)).astype(jnp.float32) + bp[0])
    y2 = ln(x3, ln2s, ln2b)
    u = (y2.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)).astype(jnp.float32) + b1[0]
    h = jax.nn.gelu(u, approximate=False)
    o = (h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)).astype(jnp.float32) + b2[0]
    return x3 + o


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"breakdown platform={platform} rows={ROWS} (B{BATCH} N{N} E{E} "
          f"H{HEADS} depth{DEPTH})", flush=True)

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

    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    aug_dt = jnp.bfloat16 if platform == "tpu" else None
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(BATCH, 28, 28, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.randint(0, 9, size=BATCH).astype(np.int32))

    model, _ = build_vit("vit_tiny_patch4_28", num_classes=9, num_channels=3,
                         image_size=28, drop_path_rate=0.1, dtype=dtype)
    sample = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = model.init(jax.random.key(0), sample)["params"]
    tx = make_optimizer(OptimizerConfig(), gradient_clip=1.0)
    state = TrainState.create(params, tx)
    loss_fn = make_cross_entropy()
    lr = jnp.float32(1e-4)

    print("\n[1] step components", flush=True)

    # Full production step: aug + model fwd/bwd + optimizer.
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

    # NOT donated (we reuse state across iterations of other measurements);
    # donation changes allocator behavior, not compute.
    def full_it(key):
        st, loss = full_step(state, images_u8, labels, key)
        return loss

    ms_full = timed("full step (aug+fwd+bwd+opt)", full_it, jax.random.key(1))

    # Augmentation kernel alone.
    aug_fn = jax.jit(functools.partial(
        train_augment, num_channels=3, out_dtype=aug_dt))
    ms_aug = timed("augmentation kernel", aug_fn, images_u8,
                   jax.random.key(2))

    x_aug = aug_fn(images_u8, jax.random.key(3))

    # Model fwd+bwd (no aug, no optimizer).
    @jax.jit
    def model_fwdbwd(p, x, labs, k_drop):
        def closs(p):
            logits = model.apply({"params": p}, x, deterministic=False,
                                 rngs={"dropout": k_drop})
            return loss_fn(logits, labs)

        return jax.value_and_grad(closs)(p)

    ms_model = timed("model fwd+bwd", model_fwdbwd, state.params, x_aug,
                     labels, jax.random.key(4))

    # Model fwd only.
    @jax.jit
    def model_fwd(p, x, labs):
        logits = model.apply({"params": p}, x, deterministic=True)
        return loss_fn(logits, labs)

    ms_model_fwd = timed("model fwd only", model_fwd, state.params, x_aug,
                         labels)

    # Optimizer alone (grads = params as a stand-in; same pytree/shape).
    _, grads0 = model_fwdbwd(state.params, x_aug, labels, jax.random.key(4))

    @jax.jit
    def opt_only(st, grads):
        return apply_updates(st, grads, tx, lr, None)

    def opt_it():
        st = opt_only(state, grads0)
        return st.params["head"]["bias"]

    ms_opt = timed("optimizer (adamw+clip)", opt_it)

    # 12-block fused stack, fwd+bwd, per mid-N mode.
    xb = jnp.asarray(rng.randn(ROWS, E), dtype)
    pkeys = jax.random.split(jax.random.key(7), DEPTH)
    plist = tuple(block_params(k) for k in pkeys)

    ms_blocks = {}
    for tag, env in [
        ("per-image 512 (shipped)", {}),
        ("per-image 256", {"VST_MIDN_TILE_ROWS": "256"}),
        ("per-image 512 group2", {"VST_MIDN_GROUP": "2"}),
        ("per-image 512 group2 recompute", {"VST_MIDN_GROUP": "2",
                                            "VST_MIDN_SAVEP": "0"}),
        ("per-image 512 group2 savep-bf16", {"VST_MIDN_GROUP": "2",
                                             "VST_MIDN_SAVEP": "2"}),
        ("per-image 512 group4", {"VST_MIDN_GROUP": "4"}),
        ("per-image 512 group8", {"VST_MIDN_GROUP": "8"}),
        ("per-image 1024 group2", {"VST_MIDN_TILE_ROWS": "1024",
                                   "VST_MIDN_GROUP": "2"}),
        ("masked 512", {"VST_MIDN_MASKED": "1"}),
        # Attention replaced by identity (measurement-only): the difference
        # vs shipped attributes the kernel's time to attention itself.
        ("attention ablated", {"VST_MIDN_ATTNOFF": "1"}),
        # Split-stage hybrid: Pallas LN1+QKV, XLA head-batched attention,
        # Pallas proj+LN2+MLP (ops/block_hybrid.py).
        ("hybrid (XLA attention)", {"VST_P4_HYBRID": "1"}),
    ]:
        fn = fused_stack_fn(env)

        def it(fn=fn):
            loss, _ = fn(xb, plist)
            return loss

        ms_blocks[tag] = timed(f"12 fused blocks fwd+bwd [{tag}]", it)
    for k in ("VST_MIDN_MASKED", "VST_MIDN_TILE_ROWS", "VST_MIDN_BATCHED",
              "VST_MIDN_ATTNOFF", "VST_MIDN_GROUP", "VST_P4_HYBRID",
              "VST_MIDN_SAVEP"):
        os.environ.pop(k, None)

    fwd_fn = fused_stack_fwd_fn()
    ms_blocks_fwd = timed("12 fused blocks fwd only [per-image 512]",
                          fwd_fn, xb, plist)

    # Plain-XLA block stack (the unfused reference).
    x3 = xb.reshape(BATCH, N, E)

    @jax.jit
    def xla_stack(x3, plist):
        def loss(x3, plist):
            h = x3.astype(jnp.float32)
            for p in plist:
                # Per-block remat: without it, holding every block's f32
                # [8192, 3, 50, 50] probs for backward needs 18 GB and
                # OOMs the 16 GB chip — remat is what a real XLA training
                # setup at this batch would have to do anyway.
                h = jax.checkpoint(xla_block)(h, p)
            return jnp.sum(h**2) * 1e-6

        return jax.value_and_grad(loss, argnums=(0, 1))(x3, plist)

    def xla_it():
        loss, _ = xla_stack(x3, plist)
        return loss

    ms_xla_blocks = timed("12 XLA blocks fwd+bwd", xla_it)

    # Isolated head-batched XLA attention (what a split-kernel hybrid pays
    # for its attention stage), fwd+bwd, one block's worth.
    from vision_spectra_tpu.ops.attention import mha

    d = E // HEADS
    qkvb = [
        jax.random.normal(jax.random.key(20 + i), (BATCH, HEADS, N, d),
                          dtype)
        for i in range(3)
    ]

    @jax.jit
    def attn_fwdbwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(
                mha(q, k, v, use_flash=False).astype(jnp.float32) ** 2
            ) * 1e-6

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    def attn_it():
        loss, _ = attn_fwdbwd(*qkvb)
        return loss

    ms_attn1 = timed("XLA attention fwd+bwd (ONE block)", attn_it)

    print("\n[2] attribution", flush=True)
    print(f"  embed+head+norm (model - blocks)          "
          f"{ms_model - ms_blocks['per-image 512 (shipped)']:9.2f} ms")
    print(f"  step overhead (full - model - aug - opt)  "
          f"{ms_full - ms_model - ms_aug - ms_opt:9.2f} ms")
    print(f"  blocks bwd (fwd+bwd - fwd)                "
          f"{ms_blocks['per-image 512 (shipped)'] - ms_blocks_fwd:9.2f} ms")
    print(f"  attention share (shipped - ablated)       "
          f"{ms_blocks['per-image 512 (shipped)'] - ms_blocks['attention ablated']:9.2f} ms")
    print(f"  12x isolated XLA attention                "
          f"{12 * ms_attn1:9.2f} ms")
    img_s = BATCH / (ms_full / 1e3)
    from bench import PEAK_TFLOPS, vit_train_flops_per_image

    flops = vit_train_flops_per_image(N, E, DEPTH, patch=4)
    print(f"  full step: {img_s:,.0f} img/s  "
          f"MFU {img_s * flops / 1e12 / PEAK_TFLOPS * 100:.1f}%")

    # Mid-N grouping at the MIM geometry (N=13 visible tokens): is group2
    # also the right default below the 32-token budget switch?
    print("\n[2b] N=13 (MIM) block stack, group sweep", flush=True)
    n13 = 13
    rows13 = BATCH * n13
    x13 = jnp.asarray(rng.randn(rows13, E), dtype)

    from vision_spectra_tpu.ops.block_fused import fused_vit_block

    for tag, env in [("group1 (shipped)", {}),
                     ("group2", {"VST_MIDN_GROUP": "2"}),
                     ("group4", {"VST_MIDN_GROUP": "4"}),
                     ("group4 recompute", {"VST_MIDN_GROUP": "4",
                                           "VST_MIDN_SAVEP": "0"})]:
        for k in ("VST_MIDN_MASKED", "VST_MIDN_TILE_ROWS",
                  "VST_MIDN_BATCHED", "VST_MIDN_ATTNOFF", "VST_MIDN_GROUP",
                  "VST_P4_HYBRID", "VST_MIDN_SAVEP"):
            os.environ.pop(k, None)
        os.environ.update(env)
        ones13 = jnp.ones((rows13, 1), jnp.float32)

        def loss13(x, params_list):
            h = x
            for p in params_list:
                h = fused_vit_block(h, p, ones13, ones13, num_heads=HEADS,
                                    n_tokens=n13)
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

        g13 = jax.jit(jax.value_and_grad(loss13, argnums=(0, 1)))

        def it13(g13=g13):
            loss, _ = g13(x13, plist)
            return loss

        timed(f"12 fused blocks N=13 fwd+bwd [{tag}]", it13)
    for k in ("VST_MIDN_GROUP",):
        os.environ.pop(k, None)

    print("\n[3] flash/XLA crossover at product N (fwd+bwd, H=3 d=64)",
          flush=True)
    from vision_spectra_tpu.ops.flash_attention import flash_mha

    for n_seq in (50, 197, 256, 512, 1024):
        # Cap total tokens so the XLA side's f32 score tensors fit HBM at
        # long N (B·H·N² bounded); flash-vs-xla compares at the SAME shape.
        b = (ROWS if n_seq <= 256 else ROWS // 4) // n_seq
        qkv = [
            jax.random.normal(jax.random.key(30 + i), (b, HEADS, n_seq, d),
                              dtype)
            for i in range(3)
        ]

        def mk(fn):
            @jax.jit
            def g(q, k, v):
                def loss(q, k, v):
                    return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2) * 1e-6

                return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

            def it():
                loss, _ = g(*qkv)
                return loss

            return it

        ms_x = timed(f"N={n_seq:<5d} xla", mk(
            lambda q, k, v: mha(q, k, v, use_flash=False)))
        ms_f = timed(f"N={n_seq:<5d} flash", mk(
            lambda q, k, v: flash_mha(q, k, v)))
        print(f"  N={n_seq}: flash/xla = {ms_f / ms_x:.2f}x "
              f"({'flash wins' if ms_f < ms_x else 'xla wins'})", flush=True)


if __name__ == "__main__":
    main()
