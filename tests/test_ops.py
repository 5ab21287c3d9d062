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


class TestFlashBackward:
    """Gradient parity of the flash custom VJP vs the XLA attention path
    (Pallas interpret mode on CPU; VERDICT r1 item 5)."""

    def _grads(self, fn, q, k, v):
        def loss(q, k, v):
            out = fn(q, k, v)
            # Non-trivial cotangent: weight by position.
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out * w) / out.size

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def _xla(self, q, k, v):
        scale = q.shape[-1] ** -0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    @pytest.mark.parametrize("n", [256, 300])  # aligned + padded
    def test_grad_parity(self, n):
        q, k, v = _qkv(b=1, h=2, n=n, d=32, seed=3)
        flash = lambda q, k, v: flash_mha(q, k, v, interpret=True)  # noqa: E731
        g_flash = self._grads(flash, q, k, v)
        g_xla = self._grads(self._xla, q, k, v)
        for gf, gx, name in zip(g_flash, g_xla, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gx), rtol=2e-4, atol=2e-5,
                err_msg=f"d{name} mismatch at n={n}",
            )

    def test_forward_still_matches(self):
        q, k, v = _qkv(b=1, h=2, n=260, d=32, seed=5)
        out_f = flash_mha(q, k, v, interpret=True)
        out_x = self._xla(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_x), rtol=2e-5, atol=2e-6
        )

    def test_mha_selects_flash_during_training(self):
        """The dispatcher uses flash for long sequences even when
        deterministic=False, as long as attention dropout is off."""
        import unittest.mock as mock

        q, k, v = _qkv(b=1, h=1, n=1024, d=16, seed=7)
        with mock.patch(
            "vision_spectra_tpu.ops.flash_attention.flash_mha",
            wraps=flash_mha,
        ) as spy:
            mha(q, k, v, deterministic=False, dropout_rate=0.0, use_flash=True)
            assert spy.called
        with mock.patch(
            "vision_spectra_tpu.ops.flash_attention.flash_mha",
            wraps=flash_mha,
        ) as spy:
            mha(
                q, k, v, deterministic=False, dropout_rate=0.1,
                dropout_rng=jax.random.key(0), use_flash=True,
            )
            assert not spy.called
