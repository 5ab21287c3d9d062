"""Mid-N (patch-4, 50-token) fused-block attention strategy sweep (TPU).

Measures the full vit_tiny_patch4_28 fwd+bwd step under the fused block
kernel across mid-N configurations:

- masked [T, T] attention, 256-row budget (the round-2 shipped path),
- per-image attention at 256 / 512 row budgets (VERDICT r2 next-round #3:
  remove the factor-k masked-FLOP overhead),
- the XLA (non-fused) baseline.

Env knobs read per call (ops/block_fused): VST_MIDN_MASKED, VST_MIDN_TILE_ROWS.
Prints ms/step and img/s; the winner becomes the default in block_fused.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_midn.py
"""
import os
import time

import numpy as np

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vision_spectra_tpu.models.vit import build_vit  # noqa: E402

BATCH = 4096
CONFIGS = [  # (label, fused, masked_env, tile_rows_env)
    ("xla blocks", False, None, None),
    ("masked T=200 (r2 shipped)", True, "1", "256"),
    ("per-image T=200", True, None, "256"),
    ("per-image T=400", True, None, "512"),
    ("per-image T=800", True, None, "1024"),
]


def main() -> None:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 28, 28, 3).astype(np.float32))
    results = {}
    for label, fused, masked, tile_rows in CONFIGS:
        for var, val in (("VST_MIDN_MASKED", masked),
                         ("VST_MIDN_TILE_ROWS", tile_rows)):
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val
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

        try:
            np.asarray(step(params, x))  # compile + honest fetch sync
            n_it = 20
            t0 = time.perf_counter()
            for _ in range(n_it):
                out = step(params, x)
            np.asarray(out)
            ms = (time.perf_counter() - t0) / n_it * 1e3
        except Exception as e:  # VMEM overflow etc. — report, keep sweeping
            print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        ips = BATCH / ms * 1e3
        results[label] = ms
        print(f"{label}: {ms:.2f} ms/step  ({ips:,.0f} img/s fwd+bwd)",
              flush=True)
    if "masked T=200 (r2 shipped)" in results:
        base = results["masked T=200 (r2 shipped)"]
        for label, ms in results.items():
            print(f"  {label}: {base / ms:.2f}x vs r2 shipped", flush=True)


if __name__ == "__main__":
    main()
