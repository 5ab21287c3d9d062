"""Prefetch loader tests."""

import numpy as np

from vision_spectra_tpu.data.base import ArraySplit, Loader
from vision_spectra_tpu.data.prefetch import PrefetchLoader


def _split(n=40):
    return ArraySplit(
        np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1)
        * np.ones((n, 4, 4, 3), np.uint8),
        np.arange(n),
    )


def test_prefetch_yields_same_batches():
    loader = Loader(_split(), batch_size=8, shuffle=False)
    direct = [b.labels.copy() for b in loader]
    pre = PrefetchLoader(Loader(_split(), batch_size=8), prefetch=2, to_device=False)
    fetched = [np.asarray(b.labels) for b in pre]
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetch_to_device():
    import jax

    pre = PrefetchLoader(Loader(_split(16), batch_size=8), to_device=True)
    batches = list(pre)
    assert len(batches) == 2
    assert isinstance(batches[0].images, jax.Array)


def test_len_and_num_samples():
    pre = PrefetchLoader(Loader(_split(20), batch_size=8))
    assert len(pre) == 3
    assert pre.num_samples == 20
