"""Root-cause probe for the cold spectral-snapshot cost (VERDICT r2 item 6).

BENCH_r02 measured 10.9 s for the first full-model snapshot (r01: 1.6 s) and
707 ms for the first new-model-size snapshot (r01: 111 ms); warm was unchanged
(~117 ms). Two candidate causes: (a) the round-2 `_covering_target` /
dynamic-length padded-SVD rework changed the compiled program fingerprints, so
the r02 run paid first-ever compiles that the persistent cache has since
amortized; (b) tunnel weather. This probe measures the same two cold
snapshots bench.py takes and prints one JSON line; run it twice to separate
the causes (single-tenant TPU — leave ~60 s between runs):

  PYTHONPATH=/root/repo:$PYTHONPATH python results/probe_spectral_cold.py
  VISION_SPECTRA_NO_COMPILATION_CACHE=1 PYTHONPATH=... python results/probe_spectral_cold.py

Run 1 (persistent cache, what bench.py sees) vs run 2 (true
compile-from-scratch cost of the current program set). The printed
``seen_targets`` shows the padded SVD programs each snapshot resolved to —
model-2 reuse (or not) of model-1's covering target is visible directly.
"""
import json
import os
import time


def main() -> None:
    from vision_spectra_tpu.core.runtime import enable_compilation_cache

    if os.environ.get("VISION_SPECTRA_NO_COMPILATION_CACHE") != "1":
        enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vision_spectra_tpu.models.vit import build_vit
    from vision_spectra_tpu.spectral import (
        compute_distributions,
        extract_all_weights,
    )
    from vision_spectra_tpu.spectral import metrics as sm

    rows = {}
    sample = jnp.zeros((2, 28, 28, 3), jnp.float32)
    model, _ = build_vit(
        "vit_tiny_patch16_224", num_classes=9, num_channels=3, image_size=28,
        dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.key(0), sample)["params"]
    weights = extract_all_weights(params, layer_patterns=None)
    t0 = time.perf_counter()
    compute_distributions(weights, on_device=True)
    rows["model1_cold_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    t0 = time.perf_counter()
    compute_distributions(weights, on_device=True)
    rows["model1_warm_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    model2, _ = build_vit(
        "vit_tiny_patch16_224", num_classes=9, num_channels=3, image_size=28,
        embed_dim=96, depth=3, dtype=jnp.bfloat16,
    )
    params2 = model2.init(jax.random.key(1), sample)["params"]
    weights2 = extract_all_weights(params2, layer_patterns=None)
    t0 = time.perf_counter()
    compute_distributions(weights2, on_device=True)
    rows["model2_cold_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    rows["seen_targets"] = list(sm._SEEN_TARGETS)
    rows["cache_enabled"] = (
        os.environ.get("VISION_SPECTRA_NO_COMPILATION_CACHE") != "1"
    )
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
