"""Fused block kernel vs XLA blocks across geometries (measured gate).

Produces the table in RESULTS.md "Fused block kernel at the science
geometry — measured decision": a jitted forward+grad step per geometry,
fetch-synced (block_until_ready is unreliable on the tunnel — CLAUDE.md),
200-step mean after one compile call.

The outcome encoded in ``models/vit._fused_blocks_active``: AUTO keeps the
XLA path below the full 256-row tile (XLA wins at the wall-clock-relevant
A/B geometries and the kernel has a ~300x pathology at 192d/128 rows);
at >= 256 rows the kernel wins (1.45x at 256 rows, 2.78x at the
8192-image flagship geometry).

Usage (TPU):  PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_block_geometry.py
"""
import time

import numpy as np

from vision_spectra_tpu.core.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vision_spectra_tpu.models.vit import build_vit  # noqa: E402

GEOMS = [  # (embed, depth, batch): protocol geometries + kernel territory
    (192, 6, 32), (192, 6, 64),    # A (rows 64), B (rows 128)
    (96, 3, 32), (96, 3, 64),      # D, C
    (32, 1, 32), (32, 1, 64),      # E, F
    (192, 6, 128),                 # first full-tile geometry (rows 256)
    (192, 6, 8192),                # flagship bench geometry
]


def main() -> None:
    rng = np.random.RandomState(0)
    for embed, depth, batch in GEOMS:
        x = jnp.asarray(rng.rand(batch, 28, 28, 3).astype(np.float32))
        row = f"E{embed} L{depth} B{batch} (rows {batch * 2}):"
        times = {}
        for fused in (False, True):
            model, _ = build_vit(
                "vit_tiny_patch16_224", num_classes=9, image_size=28,
                embed_dim=embed, depth=depth, dtype=jnp.bfloat16,
                use_fused_blocks=fused,
            )
            params = model.init(jax.random.key(0), x[:2])["params"]

            @jax.jit
            def step(p, xb):
                def loss(p):
                    out = model.apply({"params": p}, xb, deterministic=True)
                    return jnp.mean(out ** 2)

                val, _grads = jax.value_and_grad(loss)(p)
                return jnp.reshape(val, (1,))  # never fetch 0-d on the tunnel

            np.asarray(step(params, x))  # compile
            k = 200
            t0 = time.perf_counter()
            for _ in range(k):
                r = step(params, x)
            np.asarray(r)  # honest sync: fetch
            times[fused] = (time.perf_counter() - t0) / k
            row += f"  {'fused' if fused else 'xla  '}={times[fused] * 1e6:9.0f}us"
        row += f"  speedup={times[False] / times[True]:.2f}x"
        print(row, flush=True)


if __name__ == "__main__":
    main()
