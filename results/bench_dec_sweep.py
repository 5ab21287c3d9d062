"""MIM-decoder mid-N geometry sweep (TPU) — do the shipped defaults bind?

Round-5 follow-on to routing the MAE decoder through the fused block
kernel: the mid-N defaults (group2, 512-row budget, probs-spill backward)
were measured at N=50/E=192/h=3 and N=13 — this sweep re-measures them at
the decoder's geometry (N=49, E=128, h=4, batch 8192, 2 blocks fwd+bwd).

Measured (v5e): default 48.6 ms WINS — group1 52.7, group4 51.3,
recompute-bwd 58.7, group4+recompute 58.4, pad-to-56 50.9; the 256-row
budget fails to lower (245-row tile breaks the 8-sublane divisibility).

Usage (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/bench_dec_sweep.py
"""

import os, sys
sys.path.insert(0, "/root/repo/results"); sys.path.insert(0, "/root/repo")
from vision_spectra_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from bench_p4_breakdown import BATCH, timed
from vision_spectra_tpu.models.mim import MIMDecoder
platform = jax.default_backend()
np.asarray(jnp.ones((1,)))
print("decoder sweep platform=", platform, flush=True)
dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
rng = np.random.RandomState(0)
lat = jnp.asarray(rng.randn(BATCH, 13, 192), dtype)
ids = jnp.asarray(np.stack([rng.permutation(49) for _ in range(BATCH)]), jnp.int32)
dpos = jnp.asarray(rng.randn(1, 50, 128).astype(np.float32) * 0.02)
dec = MIMDecoder(encoder_embed_dim=192, decoder_embed_dim=128,
                 decoder_depth=2, decoder_num_heads=4, patch_size=4,
                 num_channels=3, dtype=dtype, use_fused_blocks=True)
dparams = dec.init(jax.random.key(0), lat, ids, dpos)["params"]
KNOBS = ("VST_MIDN_GROUP", "VST_MIDN_TILE_ROWS", "VST_MIDN_SAVEP", "VST_MIDN_PAD")
for tag, env in [
    ("default (group2, 512 rows, savep)", {}),
    ("group1", {"VST_MIDN_GROUP": "1"}),
    ("group4", {"VST_MIDN_GROUP": "4"}),
    ("256-row budget", {"VST_MIDN_TILE_ROWS": "256"}),
    ("recompute bwd", {"VST_MIDN_SAVEP": "0"}),
    ("group4 + recompute", {"VST_MIDN_GROUP": "4", "VST_MIDN_SAVEP": "0"}),
    ("pad to 56", {"VST_MIDN_PAD": "1"}),
]:
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    @jax.jit
    def dec_fwdbwd(p, lat, ids, _t=tag):
        def closs(p):
            pred = dec.apply({"params": p}, lat, ids, dpos)
            return jnp.sum(pred.astype(jnp.float32) ** 2) * 1e-6
        return jax.value_and_grad(closs)(p)
    timed(f"decoder [{tag}]", dec_fwdbwd, dparams, lat, ids)
for k in KNOBS:
    os.environ.pop(k, None)
