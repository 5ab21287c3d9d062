"""Whole-step component roofline for the patch-4 fused block stack (TPU).

VERDICT r4 next #1c: the round-4 roofline priced only attention; this one
attributes the ENTIRE 12-block stack by measured ablation (the kernel's
measurement-only knobs — numerically meaningless, timing-faithful):

    T0  stack, recompute backward (no spill)
    T1  + attention off           -> attention share   = T0 - T1
    T2  + GELU -> identity        -> GELU share        = T1 - T2
    T3  + LN -> scale*x+bias      -> LN-stats share    = T1 - T3
    T4  + GELU off + LN off       (cross-check: T1 - (T1-T2) - (T1-T3))
    T5  + weight-grads off        -> dW share          = T4 - T5
        T5 = pure fwd+dx matmul skeleton + residuals + tile DMA
    T6  stack, savep backward (the shipped config, for reference)

and prints the analytic speed-of-light for each component (197 bf16
TFLOPS MXU, 819 GB/s HBM on v5e) so measured-vs-light gaps are explicit.

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_p4_roofline.py
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
    F,
    HEADS,
    N,
    ROWS,
    block_params,
    fused_stack_fn,
    timed,
)

PEAK_TFLOPS = 197.0
HBM_GBS = 819.0

_ABL = ("VST_ABL_GELU", "VST_ABL_LN", "VST_ABL_WGRAD")


def stack(env):
    for k in _ABL:
        os.environ.pop(k, None)
    return fused_stack_fn(env)  # clears the midn knobs itself


def analytic() -> None:
    """Speed-of-light per component, whole 12-block stack fwd+bwd."""
    d = E // HEADS
    # Non-attention matmul MACs per token per block: QKV 3E^2, proj E^2,
    # MLP 2EF; x3 for fwd/dx/dW.
    mm = ROWS * (4 * E * E + 2 * E * F) * DEPTH
    mm_flops = 3 * 2 * mm
    # Attention dots (group2, block-masked [100,100] scores, 2x waste):
    # fwd scores+PV, bwd dP,dS->dq,dk + dv (5 dots of gn x gn x d class).
    gn_waste = 2.0
    attn_dots = BATCH * HEADS * (2 + 3) * (N * N * d) * gn_waste
    attn_flops = 2 * attn_dots
    # HBM bytes: per block fwd reads x (bf16) writes out; bwd reads x, dy,
    # writes dx; savep adds ps (f32 [ROWS/50*100x100... = heads*kimg*N*N])
    act = ROWS * E * 2  # bf16 bytes
    traffic_recompute = DEPTH * (2 * act + 3 * act)  # fwd r/w + bwd r/r/w
    ps_bytes = BATCH * HEADS * N * N * 4 * 2  # probs f32, x2 waste (group2)
    ao_bytes = ROWS * E * 2
    traffic_savep = traffic_recompute + DEPTH * 2 * (ps_bytes + ao_bytes)
    print("\nanalytic speed-of-light (whole stack fwd+bwd):")
    print(f"  non-attn matmuls : {mm_flops / PEAK_TFLOPS / 1e9:8.1f} ms "
          f"({mm_flops / 1e12:.1f} TFLOP)")
    print(f"  attention dots   : {attn_flops / PEAK_TFLOPS / 1e9:8.1f} ms "
          f"({attn_flops / 1e12:.1f} TFLOP incl {gn_waste}x mask waste)")
    print(f"  HBM, recompute   : {traffic_recompute / HBM_GBS / 1e6:8.1f} ms "
          f"({traffic_recompute / 1e9:.1f} GB)")
    print(f"  HBM, savep       : {traffic_savep / HBM_GBS / 1e6:8.1f} ms "
          f"({traffic_savep / 1e9:.1f} GB)", flush=True)


def main() -> None:
    platform = jax.default_backend()
    np.asarray(jnp.ones((1,)))
    print(f"roofline platform={platform} (B{BATCH} N{N} E{E} H{HEADS} "
          f"depth{DEPTH})", flush=True)
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(ROWS, E), dtype)
    plist = tuple(block_params(k) for k in jax.random.split(jax.random.key(7),
                                                            DEPTH))
    analytic()

    print("\nmeasured ablation ladder (12-block stack fwd+bwd):", flush=True)
    rows = []
    for tag, env in [
        ("T0 recompute", {"VST_MIDN_SAVEP": "0"}),
        ("T1 +attn off", {"VST_MIDN_SAVEP": "0", "VST_MIDN_ATTNOFF": "1"}),
        ("T2 +attn,gelu off", {"VST_MIDN_SAVEP": "0", "VST_MIDN_ATTNOFF": "1",
                               "VST_ABL_GELU": "1"}),
        ("T3 +attn,ln off", {"VST_MIDN_SAVEP": "0", "VST_MIDN_ATTNOFF": "1",
                             "VST_ABL_LN": "1"}),
        ("T4 +attn,gelu,ln off", {"VST_MIDN_SAVEP": "0",
                                  "VST_MIDN_ATTNOFF": "1",
                                  "VST_ABL_GELU": "1", "VST_ABL_LN": "1"}),
        ("T5 +attn,gelu,ln,dW off", {"VST_MIDN_SAVEP": "0",
                                     "VST_MIDN_ATTNOFF": "1",
                                     "VST_ABL_GELU": "1", "VST_ABL_LN": "1",
                                     "VST_ABL_WGRAD": "1"}),
        ("T6 savep (shipped)", {}),
    ]:
        # Env (midn + ABL knobs) is read at trace time, which happens on
        # the first call inside timed() — set everything before calling.
        for k in _ABL:
            os.environ.pop(k, None)
        fn = fused_stack_fn({k: v for k, v in env.items()
                             if not k.startswith("VST_ABL")})
        os.environ.update({k: v for k, v in env.items()
                           if k.startswith("VST_ABL")})

        def it(fn=fn):
            loss, _ = fn(xb, plist)
            return loss

        rows.append((tag, timed(f"stack [{tag}]", it)))
    for k in _ABL:
        os.environ.pop(k, None)

    t = dict(rows)
    g = lambda k: t.get(k, float("nan"))  # noqa: E731
    print("\nattribution (ms):", flush=True)
    print(f"  attention (recompute bwd) : {g('T0 recompute') - g('T1 +attn off'):7.1f}")
    print(f"  GELU fwd+bwd              : {g('T1 +attn off') - g('T2 +attn,gelu off'):7.1f}")
    print(f"  LN stats fwd+bwd          : {g('T1 +attn off') - g('T3 +attn,ln off'):7.1f}")
    print(f"  weight-grad path          : {g('T4 +attn,gelu,ln off') - g('T5 +attn,gelu,ln,dW off'):7.1f}")
    print(f"  matmul skeleton + DMA     : {g('T5 +attn,gelu,ln,dW off'):7.1f}")
    print(f"  spill win vs recompute    : {g('T0 recompute') - g('T6 savep (shipped)'):7.1f}")


if __name__ == "__main__":
    main()
