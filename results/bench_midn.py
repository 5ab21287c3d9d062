"""Mid-N fused-block attention strategy sweep (TPU): patch-4 + MIM-13.

Measures fwd+bwd steps under the fused block kernel across mid-N attention
configurations, for the two shipped mid-N geometries:

- ``vit``: vit_tiny_patch4_28 classification (N=50 tokens),
- ``mim``: MIM on the patch-4 encoder (mask 0.75 -> N=13 visible tokens,
  where per-image unrolls many tiny [13, 13] dots and the masked [T, T]
  path may win — measure, don't guess).

Configs: masked [T, T] attention at 256 / 512 row budgets, per-image
attention at 256 / 512 / 1024 row budgets (VERDICT r2 next-round #3),
batched 3-D-dot per-image attention at 256 / 512, and the XLA (non-fused)
baseline.

Env knobs read per call (ops/block_fused): VST_MIDN_MASKED,
VST_MIDN_TILE_ROWS, VST_MIDN_BATCHED.
Prints ms/step and img/s; the winner becomes the default in block_fused.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_midn.py [vit|mim|all]
"""
import os
import sys
import time

import numpy as np

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vision_spectra_tpu.models.vit import build_vit  # noqa: E402

BATCH = 4096
CONFIGS = [  # (label, fused, masked_env, tile_rows_env, batched_env)
    ("xla blocks", False, None, None, None),
    ("masked T<=256 (r2 shipped)", True, "1", "256", None),
    ("per-image T<=256", True, None, "256", None),
    ("per-image T<=512", True, None, "512", None),
    ("per-image T<=1024", True, None, "1024", None),
    ("masked T<=512", True, "1", "512", None),
    ("batched T<=256", True, None, "256", "1"),
    ("batched T<=512", True, None, "512", "1"),
]


def _set_env(masked, tile_rows, batched) -> None:
    for var, val in (("VST_MIDN_MASKED", masked),
                     ("VST_MIDN_TILE_ROWS", tile_rows),
                     ("VST_MIDN_BATCHED", batched)):
        if val is None:
            os.environ.pop(var, None)
        else:
            os.environ[var] = val


def _bench(label, step, params, x) -> float | None:
    try:
        np.asarray(step(params, x))  # compile + honest fetch sync
        n_it = 20
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = step(params, x)
        np.asarray(out)
        return (time.perf_counter() - t0) / n_it * 1e3
    except Exception as e:  # VMEM overflow etc. — report, keep sweeping
        print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        return None


def _report(results: dict, base_label: str) -> None:
    if base_label in results:
        base = results[base_label]
        for label, ms in results.items():
            print(f"  {label}: {base / ms:.2f}x vs r2 shipped", flush=True)


def sweep_vit() -> None:
    print("=== vit_tiny_patch4_28 (N=50 tokens), fwd+bwd ===", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 28, 28, 3).astype(np.float32))
    results = {}
    for label, fused, masked, tile_rows, batched in CONFIGS:
        _set_env(masked, tile_rows, batched)
        model, _ = build_vit(
            "vit_tiny_patch4_28", num_classes=9, image_size=28,
            dtype=jnp.bfloat16, use_fused_blocks=fused if fused else False,
        )
        params = model.init(jax.random.key(0), x[:2])["params"]

        @jax.jit
        def step(p, xb):
            def loss(p):
                out = model.apply({"params": p}, xb, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(p)
            leaves = jax.tree.leaves(grads)
            return jnp.reshape(val + leaves[0].astype(jnp.float32).sum(), (1,))

        ms = _bench(label, step, params, x)
        if ms is None:
            continue
        results[label] = ms
        print(f"{label}: {ms:.2f} ms/step  ({BATCH / ms * 1e3:,.0f} img/s "
              "fwd+bwd)", flush=True)
    _report(results, "masked T<=256 (r2 shipped)")


def sweep_mim() -> None:
    print("=== MIM patch-4 encoder (N=13 visible tokens), fwd+bwd ===",
          flush=True)
    from vision_spectra_tpu.models import MIMModel

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 28, 28, 3).astype(np.float32))
    results = {}
    for label, fused, masked, tile_rows, batched in CONFIGS:
        _set_env(masked, tile_rows, batched)
        enc, _ = build_vit(
            "vit_tiny_patch4_28", num_classes=9, image_size=28,
            dtype=jnp.bfloat16, use_fused_blocks=fused if fused else False,
        )
        mim = MIMModel(encoder=enc, decoder_embed_dim=128, decoder_depth=2,
                       decoder_num_heads=4, mask_ratio=0.75,
                       dtype=jnp.bfloat16)
        params = mim.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)},
            x[:2], 0.75,
        )["params"]

        @jax.jit
        def step(p, xb):
            def loss(p):
                out, _pred, _mask = mim.apply(
                    {"params": p}, xb, 0.75, deterministic=True,
                    rngs={"mask": jax.random.key(7)})
                return out

            val, grads = jax.value_and_grad(loss)(p)
            leaves = jax.tree.leaves(grads)
            return jnp.reshape(val + leaves[0].astype(jnp.float32).sum(), (1,))

        ms = _bench(label, step, params, x)
        if ms is None:
            continue
        results[label] = ms
        print(f"{label}: {ms:.2f} ms/step  ({BATCH / ms * 1e3:,.0f} img/s "
              "fwd+bwd)", flush=True)
    _report(results, "masked T<=256 (r2 shipped)")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("vit", "all"):
        sweep_vit()
    if which in ("mim", "all"):
        sweep_mim()


if __name__ == "__main__":
    main()
