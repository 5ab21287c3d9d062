"""CPU linear-probe sweep over the surrogate's v4 tint amplitude.

The v4 surrogate adds a per-texture-class DC + linear-gradient tint
(``data/medmnist.SURROGATE_TINT_AMP``) as a linearly decodable cue that
lifts the low-capacity floor (VERDICT r3 item 3: scenario F sat 6 pt under
the reference while B/C were within 0.5 pt). This script maps amplitude →
raw-pixel linear-probe accuracy on the surrogate, which brackets the cue's
strength independently of model capacity; the scenario-F calibration on
TPU (results/run_f_calibration.py) picks the shipped amplitude from 2–3
candidates chosen off this curve.

Measured curve (round 4, 6k train / 2k val, multinomial logistic
regression on standardized raw pixels, 30 epochs SGD+momentum):

    amp 0.0    -> 17.3 %   (chance 11.1 %; texture stats barely linear)
    amp 0.0075 -> 39.7 %
    amp 0.015  -> 55.0 %
    amp 0.03   -> 64.9 %
    amp 0.06   -> 70.1 %   (saturating toward the q = 0.80 ceiling)

The scenario-F model (32d/1L ViT) reads texture statistics the probe
cannot (50.8 % at amp 0), so its accuracy sits above this curve at low
amplitudes; the curve bounds how much the tint alone contributes.

Usage (CPU): PYTHONPATH=/root/repo:$PYTHONPATH python results/probe_tint_sweep.py [amp ...]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import vision_spectra_tpu.data.medmnist as mm  # noqa: E402


def probe(amp: float, ntr: int = 6000, nte: int = 2000) -> float:
    """Linear-probe val accuracy on the surrogate at tint amplitude ``amp``."""
    mm.SURROGATE_TINT_AMP = amp
    mm._SURROGATE_BANKS.clear()
    mm._SURROGATE_CACHE.clear()
    tr = mm._surrogate_split("pathmnist", "train", ntr, 28, seed=1000)
    te = mm._surrogate_split("pathmnist", "val", nte, 28, seed=1001)
    x_tr = tr.images.reshape(ntr, -1).astype(np.float32) / 255.0
    y_tr = tr.labels.astype(np.int64).ravel()
    x_te = te.images.reshape(nte, -1).astype(np.float32) / 255.0
    y_te = te.labels.astype(np.int64).ravel()
    mu, sd = x_tr.mean(0), x_tr.std(0) + 1e-6
    x_tr = (x_tr - mu) / sd
    x_te = (x_te - mu) / sd

    rng = np.random.RandomState(0)
    w = np.zeros((x_tr.shape[1], 9), np.float32)
    b = np.zeros(9, np.float32)
    vw, vb = np.zeros_like(w), np.zeros_like(b)
    lr, mom = 0.05, 0.9
    for _ in range(30):
        idx = rng.permutation(ntr)
        for s in range(0, ntr, 256):
            j = idx[s : s + 256]
            z = x_tr[j] @ w + b
            z -= z.max(1, keepdims=True)
            p = np.exp(z)
            p /= p.sum(1, keepdims=True)
            p[np.arange(len(j)), y_tr[j]] -= 1.0
            p /= len(j)
            vw = mom * vw - lr * (x_tr[j].T @ p + 1e-4 * w)
            vb = mom * vb - lr * p.sum(0)
            w += vw
            b += vb
    return float(((x_te @ w + b).argmax(1) == y_te).mean())


if __name__ == "__main__":
    amps = [float(a) for a in sys.argv[1:]] or [0.0, 0.0075, 0.015, 0.03, 0.06]
    for amp in amps:
        print(f"amp={amp}: linear probe val acc {probe(amp) * 100:.1f}%",
              flush=True)
