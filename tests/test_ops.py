"""Op-level tests: attention paths and the Pallas flash kernel.

The flash kernel runs in Pallas interpret mode on CPU here; compiled-mode
parity on real TPU is exercised by bench/perf scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_spectra_tpu.ops.attention import attention_probs, mha
from vision_spectra_tpu.ops.flash_attention import flash_mha


def _qkv(b=2, h=3, n=197, d=64, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) for _ in range(3)
    )


class TestMha:
    def test_shapes(self):
        q, k, v = _qkv()
        out = mha(q, k, v)
        assert out.shape == q.shape

    def test_softmax_rows_sum_to_one(self):
        q, k, v = _qkv(n=16)
        probs = attention_probs(q, k)
        np.testing.assert_allclose(
            np.asarray(probs.sum(-1)), 1.0, rtol=1e-5
        )

    def test_matches_manual(self):
        q, k, v = _qkv(b=1, h=1, n=8, d=4)
        scale = 4**-0.5
        s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
        np.testing.assert_allclose(np.asarray(mha(q, k, v)), ref, rtol=1e-4, atol=1e-5)

    def test_dropout_only_when_stochastic(self):
        q, k, v = _qkv(n=16)
        a = mha(q, k, v, dropout_rate=0.5, deterministic=True)
        b = mha(q, k, v)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = mha(
            q, k, v, dropout_rate=0.5, deterministic=False,
            dropout_rng=jax.random.key(0),
        )
        assert not np.array_equal(np.asarray(c), np.asarray(b))


class TestFlashAttention:
    @pytest.mark.parametrize(
        "shape",
        [(2, 3, 197, 64), (1, 2, 300, 32), (2, 1, 64, 64), (1, 1, 128, 128)],
    )
    def test_parity_with_xla(self, shape):
        q, k, v = _qkv(*shape)
        ref = mha(q, k, v)
        out = flash_mha(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_custom_scale(self):
        q, k, v = _qkv(n=64, d=32)
        ref = mha(q, k, v, scale=0.5)
        out = flash_mha(q, k, v, scale=0.5, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_padding_mask_correct(self):
        """Sequence not a block multiple: padded keys must not leak."""
        q, k, v = _qkv(n=130)
        ref = mha(q, k, v)
        out = flash_mha(q, k, v, interpret=True, block_q=128, block_k=128)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
