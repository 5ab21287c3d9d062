"""Probs-spill (VST_MIDN_SAVEP) A/B on the fused 12-block stack (TPU).

Measures the fused block stack fwd+bwd at the two shipped mid-N geometries
(patch-4 N=50 group2, MIM N=13 group4) with the recompute backward vs the
probs-spill backward (f32 and bf16 probs) — the round-4 candidate from the
patch-4 roofline: the backward's flash-style recompute re-executes the
attention forward at ~10% MXU efficiency, and the spill trades that
re-execution for HBM round-trip traffic (probs + attention output).

A focused subset of results/bench_p4_breakdown.py section [1]/[2b] so the
A/B fits a short tunnel window; reuses its harness helpers.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_savep.py
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
    N,
    ROWS,
    block_params,
    fused_stack_fn,
    timed,
)
from vision_spectra_tpu.ops.block_fused import fused_vit_block  # noqa: E402


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"savep A/B platform={platform} rows={ROWS} (B{BATCH} N{N} E{E} "
          f"H{HEADS} depth{DEPTH})", flush=True)

    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(ROWS, E), dtype)
    plist = tuple(block_params(k) for k in jax.random.split(jax.random.key(7),
                                                           DEPTH))

    print(f"\n[N={N}] 12-block stack fwd+bwd (group2 default)", flush=True)
    for tag, env in [
        ("savep f32 (shipped)", {}),
        ("recompute", {"VST_MIDN_SAVEP": "0"}),
        ("savep bf16", {"VST_MIDN_SAVEP": "2"}),
        ("savep f32 ungrouped", {"VST_MIDN_GROUP": "1"}),
    ]:
        fn = fused_stack_fn(env)

        def it(fn=fn):
            loss, _ = fn(xb, plist)
            return loss

        timed(f"stack [{tag}]", it)

    n13 = 13
    rows13 = BATCH * n13
    x13 = jnp.asarray(rng.randn(rows13, E), dtype)
    ones13 = jnp.ones((rows13, 1), jnp.float32)
    print(f"\n[N={n13}] 12-block stack fwd+bwd (group4 default)", flush=True)
    for tag, env in [
        ("savep f32 (shipped)", {}),
        ("recompute", {"VST_MIDN_SAVEP": "0"}),
        ("savep bf16", {"VST_MIDN_SAVEP": "2"}),
    ]:
        for k in ("VST_MIDN_MASKED", "VST_MIDN_TILE_ROWS", "VST_MIDN_BATCHED",
                  "VST_MIDN_ATTNOFF", "VST_MIDN_GROUP", "VST_P4_HYBRID",
                  "VST_MIDN_SAVEP"):
            os.environ.pop(k, None)
        os.environ.update(env)

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

        timed(f"stack N=13 [{tag}]", it13)
    for k in ("VST_MIDN_SAVEP",):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
