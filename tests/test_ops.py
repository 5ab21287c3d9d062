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


class TestFlashConfigPath:
    """Config-driven flash selection (VERDICT r1 item 4): a ModelConfig with
    ``use_flash`` builds a model whose attention actually dispatches the
    flash kernel at a long-sequence geometry."""

    def test_config_drives_dispatch(self):
        import unittest.mock as mock

        from vision_spectra_tpu.config import ModelConfig
        from vision_spectra_tpu.models import create_vit_classifier

        cfg = ModelConfig(
            name="vit_tiny_patch4_224", use_flash=True, drop_path_rate=0.0,
            embed_dim=32, depth=1, num_heads=2,
        )
        # img 128 / patch 4 -> 1024 patches + CLS = 1025 tokens >= gate.
        model, desc = create_vit_classifier(cfg, num_classes=3, image_size=128)
        assert model.use_flash is True
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        params = model.init(jax.random.key(0), x)

        def fake_flash(q, k, v, *, scale=None, **kw):
            fake_flash.called = True
            return jnp.zeros_like(q)

        fake_flash.called = False
        with mock.patch(
            "vision_spectra_tpu.ops.flash_attention.flash_mha", fake_flash
        ):
            model.apply(params, x, deterministic=True)
        assert fake_flash.called

    def test_auto_resolution(self):
        from vision_spectra_tpu.models import resolve_use_flash

        # On the CPU test backend auto stays off (interpret-mode Pallas would
        # be a pure slowdown); explicit values pass through.
        assert resolve_use_flash(None) == (jax.default_backend() == "tpu")
        assert resolve_use_flash(True) is True
        assert resolve_use_flash(False) is False

    def test_short_sequences_keep_xla(self):
        import unittest.mock as mock

        from vision_spectra_tpu.config import ModelConfig
        from vision_spectra_tpu.models import create_vit_classifier

        cfg = ModelConfig(
            name="vit_tiny_patch16_224", use_flash=True, drop_path_rate=0.0,
            embed_dim=32, depth=1, num_heads=2,
        )
        model, _ = create_vit_classifier(cfg, num_classes=3, image_size=28)
        x = jnp.zeros((2, 28, 28, 3), jnp.float32)
        params = model.init(jax.random.key(0), x)
        with mock.patch(
            "vision_spectra_tpu.ops.flash_attention.flash_mha"
        ) as spy:
            out = model.apply(params, x, deterministic=True)
        assert not spy.called
        assert np.isfinite(np.asarray(out)).all()


class TestAugWarpKernel:
    """Pallas fused augmentation kernel vs the XLA transform paths.

    Interpret mode on CPU; compiled-mode numbers come from bench.py on TPU.
    """

    def _batch(self, b=6, h=28, w=28, c=3, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(
            rng.randint(0, 256, size=(b, h, w, c), dtype=np.uint8)
        )

    def test_gate_rejects_tensor_parallel_only_mesh(self, monkeypatch):
        """A data=1/model=N mesh must keep the XLA path: warp_augment only
        wraps in shard_map when the DATA axis is sharded, and a bare
        pallas_call inside a multi-device program is not
        GSPMD-partitionable. (Backend monkeypatched: the mesh rule is
        otherwise unreachable on CPU where the gate exits early.)"""
        from vision_spectra_tpu.ops.aug_warp import use_pallas_warp
        from vision_spectra_tpu.parallel.mesh import make_mesh

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        shape = (64, 28, 28, 3)
        assert not use_pallas_warp(shape, make_mesh(data_axis=1, model_axis=8))
        assert use_pallas_warp(shape, make_mesh(data_axis=8, model_axis=1))
        # data-sharded but indivisible per-shard batch: XLA path too
        assert not use_pallas_warp(
            (60, 28, 28, 3), make_mesh(data_axis=8, model_axis=1)
        )

    def test_pick_group_scales_down_with_image_size(self):
        """Group selection is VMEM-bounded: G*HW stays within the measured
        28-px/group-128 budget, so 64-px batches (use_pallas_warp admits up
        to 64 px) scale the group down instead of oversubscribing VMEM."""
        from vision_spectra_tpu.ops.aug_warp import _pick_group

        assert _pick_group(8192, 28 * 28) == 128
        assert _pick_group(8192, 32 * 32) == 64   # cap 98 -> next divisor 64
        assert _pick_group(8192, 64 * 64) == 16   # cap 24 -> 16
        assert _pick_group(8, 64 * 64) == 2       # tiny batch, 4 grid steps
        assert _pick_group(7, 64 * 64) == 1       # prime batch: group 1

    def test_composed_nearest_equals_two_pass(self):
        """One composed warp == the literal two-resample torchvision recipe,
        bit-for-bit (the intermediate is only sampled at integer coords)."""
        from vision_spectra_tpu.data.transforms import (
            _train_augment_ref_twopass,
            train_augment_ref,
        )

        imgs = self._batch(b=8, seed=1)
        key = jax.random.key(42)
        composed = train_augment_ref(imgs, key, num_channels=3)
        twopass = _train_augment_ref_twopass(imgs, key, num_channels=3)
        np.testing.assert_allclose(
            np.asarray(composed), np.asarray(twopass), rtol=0, atol=1e-5
        )

    @pytest.mark.parametrize(
        "c,b",
        [(1, 4), (3, 4), (3, 32)],  # b=32 exercises a full single-program
        # group (channel-major packing at full width, MIN_GRID forced to 1);
        # b=4 the small-batch group fallback
    )
    def test_kernel_nearest_matches_xla(self, c, b, monkeypatch, request):
        """Kernel (torchvision mode) == XLA composed path, same params."""
        from vision_spectra_tpu.ops import aug_warp

        if b == 32:
            # Pin group == b so the whole batch runs as one program group
            # (production picks group = b/MIN_GRID here; group size never
            # changes values, only packing width — this covers the widest).
            monkeypatch.setattr(aug_warp, "MIN_GRID", 1)
            aug_warp._build_call.cache_clear()
            # The build cache keys on batch geometry, not group — drop the
            # MIN_GRID=1 builds so later tests rebuild under production rules.
            request.addfinalizer(aug_warp._build_call.cache_clear)
        from vision_spectra_tpu.data.transforms import (
            _color_jitter_shuffled,
            _jitter_params,
            _nearest_sample_from_coords,
            _ref_warp_mats,
            _stats,
            composed_nearest_coords,
        )
        from vision_spectra_tpu.ops.aug_warp import warp_augment

        imgs = self._batch(b=b, c=c, seed=2)
        b, h, w, _ = imgs.shape
        key = jax.random.key(7)
        rot, aff, k_color = _ref_warp_mats(key, b, h, w)
        factors, opcodes = _jitter_params(k_color, b, c)
        mean, std = _stats(c)

        out_k = warp_augment(
            imgs, rot, aff, factors, opcodes, mean, std,
            num_channels=c, bilinear=False, interpret=True,
        )

        x = imgs.astype(jnp.float32) / 255.0
        sx, sy, valid = composed_nearest_coords(rot, aff, h, w)
        x = _nearest_sample_from_coords(x, sx, sy, valid)
        x = _color_jitter_shuffled(k_color, x, c)
        out_x = (x - mean) / std
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_x), rtol=0, atol=2e-2
        )

    @pytest.mark.parametrize("c", [1, 3])
    def test_kernel_bilinear_matches_xla(self, c):
        """Kernel (fused bilinear mode) == XLA fused path, same params."""
        from vision_spectra_tpu.data.transforms import (
            _affine_grid_sample,
            _color_jitter,
            _jitter_factors,
            _random_affine_inverse,
            _stats,
        )
        from vision_spectra_tpu.ops.aug_warp import warp_augment

        imgs = self._batch(b=4, c=c, seed=3)
        b, h, w, _ = imgs.shape
        k_affine, k_color = jax.random.split(jax.random.key(11))
        inv = _random_affine_inverse(k_affine, b, h, w)
        fb, fc, fs = _jitter_factors(k_color, b)
        mean, std = _stats(c)

        out_k = warp_augment(
            imgs, inv, None, jnp.stack([fb, fc, fs], axis=1), None,
            mean, std, num_channels=c, bilinear=True, interpret=True,
        )

        x = imgs.astype(jnp.float32) / 255.0
        x = _affine_grid_sample(x, inv)
        x = _color_jitter(k_color, x, c)
        out_x = (x - mean) / std
        # The kernel keeps the second contraction in f32 (the XLA path casts
        # it to bf16), so tiny per-pixel differences are expected.
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_x), rtol=0, atol=5e-2
        )

    def test_dispatch_is_cpu_safe(self):
        """On CPU the public entry points take the XLA path and still work."""
        from vision_spectra_tpu.data.transforms import (
            train_augment,
            train_augment_ref,
        )

        imgs = self._batch(b=4)
        out1 = train_augment(imgs, jax.random.key(0), num_channels=3)
        out2 = train_augment_ref(imgs, jax.random.key(0), num_channels=3)
        assert out1.shape == imgs.shape and out2.shape == imgs.shape
        assert np.isfinite(np.asarray(out1)).all()
        assert np.isfinite(np.asarray(out2)).all()

    @pytest.mark.parametrize("bilinear", [False, True])
    def test_kernel_gather_indices_matches_pregathered(self, bilinear):
        """gather_indices DMA-by-index == augmenting the gathered batch:
        the fused-epoch shuffle must be bit-identical either way."""
        from vision_spectra_tpu.data.transforms import (
            _jitter_factors,
            _jitter_params,
            _random_affine_inverse,
            _ref_warp_mats,
            _stats,
        )
        from vision_spectra_tpu.ops.aug_warp import warp_augment

        full = self._batch(b=16, seed=5)
        idx = jnp.asarray([3, 0, 15, 7, 7, 2, 9, 11], jnp.int32)
        b, (_, h, w, c) = len(idx), full.shape
        key = jax.random.key(13)
        mean, std = _stats(c)
        if bilinear:
            k_affine, k_color = jax.random.split(key)
            inv = _random_affine_inverse(k_affine, b, h, w)
            fb, fc, fs = _jitter_factors(k_color, b)
            args = (inv, None, jnp.stack([fb, fc, fs], axis=1), None)
        else:
            rot, aff, k_color = _ref_warp_mats(key, b, h, w)
            factors, opcodes = _jitter_params(k_color, b, c)
            args = (rot, aff, factors, opcodes)

        kw = dict(num_channels=c, bilinear=bilinear, interpret=True)
        out_gather = warp_augment(
            full, *args, mean, std, gather_indices=idx, **kw
        )
        out_pre = warp_augment(jnp.take(full, idx, axis=0), *args, mean, std, **kw)
        np.testing.assert_array_equal(np.asarray(out_gather), np.asarray(out_pre))

    def test_out_dtype_bf16_matches_f32_cast(self):
        """out_dtype=bf16 == f32 output cast to bf16 (kernel and XLA path)."""
        from vision_spectra_tpu.data.transforms import train_augment_ref

        imgs = self._batch(b=4, seed=8)
        key = jax.random.key(3)
        f32 = train_augment_ref(imgs, key, num_channels=3)
        bf16 = train_augment_ref(
            imgs, key, num_channels=3, out_dtype=jnp.bfloat16
        )
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32.astype(jnp.bfloat16)), np.asarray(bf16)
        )


class TestFusedBlock:
    """Whole-block Pallas kernel (ops/block_fused.py) vs the XLA block path.

    Interpret mode on CPU (use_fused_blocks=True forces the kernel);
    compiled-mode parity on real TPU is asserted by the bench/perf scripts
    (measured: fwd 1.5%, grads 1.2% relative at B=2048, bf16).
    """

    def _models(self, **kw):
        from vision_spectra_tpu.models import build_vit

        m_x, _ = build_vit(dtype=jnp.bfloat16, use_fused_blocks=False,
                           num_classes=5, **kw)
        m_f, _ = build_vit(dtype=jnp.bfloat16, use_fused_blocks=True,
                           num_classes=5, **kw)
        return m_x, m_f

    def _data(self, b=128, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.randn(b, 28, 28, 3).astype(np.float32))

    @pytest.mark.parametrize(
        "kw",
        [
            {},  # ViT-Tiny 192d/12L/3H
            {"embed_dim": 96, "depth": 3},  # scenario C/D geometry
            {"embed_dim": 32, "depth": 1},  # scenario E/F geometry
        ],
    )
    def test_forward_parity(self, kw):
        m_x, m_f = self._models(**kw)
        x = self._data()
        params = m_x.init(jax.random.key(0), x[:2])["params"]
        a = np.asarray(m_x.apply({"params": params}, x, deterministic=True))
        b = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        scale = np.abs(a).max()
        assert np.abs(a - b).max() < 0.05 * max(scale, 1.0)

    def test_grad_parity(self):
        m_x, m_f = self._models()
        x = self._data()
        params = m_x.init(jax.random.key(0), x[:2])["params"]

        def mk(m):
            return jax.grad(
                lambda p: jnp.mean(
                    m.apply({"params": p}, x, deterministic=True) ** 2
                )
            )

        gx = mk(m_x)(params)
        gf = mk(m_f)(params)
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            assert np.abs(a - b).max() <= 0.05 * (np.abs(a).max() + 1e-6)

    @pytest.mark.parametrize("b", [32, 64])
    def test_science_geometry_parity(self, b):
        """Scenario batches (32/64 images at N=2 -> 64/128 rows) are served
        by the whole-batch tile (VERDICT r1 item 8): forward AND grads match
        the XLA path."""
        m_x, m_f = self._models(embed_dim=96, depth=3)
        x = self._data(b=b)
        params = m_x.init(jax.random.key(0), x[:2])["params"]
        a = np.asarray(m_x.apply({"params": params}, x, deterministic=True))
        c = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        assert np.abs(a - c).max() < 0.05 * max(np.abs(a).max(), 1.0)

        def mk(m):
            return jax.grad(
                lambda p: jnp.mean(
                    m.apply({"params": p}, x, deterministic=True) ** 2
                )
            )

        for ga, gb in zip(
            jax.tree.leaves(mk(m_x)(params)), jax.tree.leaves(mk(m_f)(params))
        ):
            ga = np.asarray(ga, np.float32)
            gb = np.asarray(gb, np.float32)
            assert np.abs(ga - gb).max() <= 0.05 * (np.abs(ga).max() + 1e-6)

    def test_droppath_training_mode(self):
        """Stochastic-depth masks thread through the kernel; loss is finite
        and differs across dropout keys (masks actually applied)."""
        _, m_f = self._models()
        x = self._data()
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def run(key):
            return m_f.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": key},
            )

        o1 = np.asarray(run(jax.random.key(1)))
        o2 = np.asarray(run(jax.random.key(2)))
        assert np.isfinite(o1).all() and np.isfinite(o2).all()
        assert np.abs(o1 - o2).max() > 1e-4

    def test_auto_gate_keeps_xla_below_full_tile(self, monkeypatch):
        """Measured decision (results/RESULTS.md): in AUTO mode the science
        geometries (rows < 256) stay on the XLA path — the kernel is slower
        there and has a perf cliff at 192d/128 rows — while >= 256 rows
        engage the kernel. Explicit use_fused_blocks=True still serves
        small batches (covered by test_science_geometry_parity)."""
        import vision_spectra_tpu.ops.block_fused as bf
        from vision_spectra_tpu.models.vit import build_vit

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "device_count", lambda: 1)

        def boom(*a, **k):
            raise RuntimeError("kernel dispatched")

        monkeypatch.setattr(bf, "fused_vit_block", boom)
        model, _ = build_vit(
            "vit_tiny_patch16_224", num_classes=3, image_size=28,
            embed_dim=32, depth=1, dtype=jnp.bfloat16,
        )  # use_fused_blocks defaults to None (auto)
        params = model.init(jax.random.key(0), jnp.zeros((2, 28, 28, 3)))[
            "params"
        ]
        # 32 images -> 64 rows < 256: auto must take the XLA path.
        out = model.apply(
            {"params": params}, jnp.zeros((32, 28, 28, 3)), deterministic=True
        )
        assert np.isfinite(np.asarray(out, np.float32)).all()
        # 128 images -> 256 rows: auto engages the kernel (sentinel raises).
        with pytest.raises(RuntimeError, match="kernel dispatched"):
            model.apply(
                {"params": params}, jnp.zeros((128, 28, 28, 3)),
                deterministic=True,
            )

    def test_gate_respects_geometry(self):
        """Geometry gate (backend-agnostic kernel_serves): odd row counts,
        rows not divisible by n_tokens, and oversized embed dims all fall
        back to the XLA path."""
        from vision_spectra_tpu.ops.block_fused import kernel_serves

        assert kernel_serves(rows=512, n_tokens=2)
        assert not kernel_serves(rows=250, n_tokens=2)
        # rows=512 is NOT a multiple of 50 tokens — whole images would
        # straddle tiles; must be rejected, not truncated.
        assert not kernel_serves(rows=512, n_tokens=50)
        assert kernel_serves(rows=800, n_tokens=50)
        assert not kernel_serves(rows=512, n_tokens=2, embed_dim=768)

    def test_gelu_matches_exact(self):
        """The kernel's tanh-form GELU matches exact erf-GELU to 1e-5
        (claimed 5.9e-6 max over [-12, 12]; bf16 resolution is ~4e-3),
        including the saturated tails."""
        from vision_spectra_tpu.ops.block_fused import _gelu

        u = jnp.linspace(-30.0, 30.0, 60001)
        exact = u * 0.5 * (1.0 + jax.lax.erf(u * 0.7071067811865476))
        np.testing.assert_allclose(
            np.asarray(_gelu(u)), np.asarray(exact), atol=1e-5
        )

    def test_dgelu_is_forward_derivative(self):
        """_dgelu is the exact derivative of the _gelu actually computed
        (gradient consistency), checked against autodiff of _gelu."""
        from vision_spectra_tpu.ops.block_fused import _dgelu, _gelu

        u = jnp.linspace(-8.0, 8.0, 4001)
        autodiff = jax.vmap(jax.grad(lambda v: _gelu(v)))(u)
        np.testing.assert_allclose(
            np.asarray(_dgelu(u)), np.asarray(autodiff), rtol=1e-5, atol=1e-6
        )


class TestFusedBlockGeneralN:
    """Block-diagonal masked attention path (2 < N <= 128 tokens)."""

    def _build(self, fused, dtype):
        from vision_spectra_tpu.models import build_vit

        m, _ = build_vit("vit_tiny_patch4_28", num_classes=5, dtype=dtype,
                         use_fused_blocks=fused)
        return m

    def _data(self, b=16, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.randn(b, 28, 28, 3).astype(np.float32))

    def test_forward_parity_n50(self):
        x = self._data()
        m_x = self._build(False, jnp.bfloat16)
        m_f = self._build(True, jnp.bfloat16)
        params = m_x.init(jax.random.key(0), x[:2])["params"]
        a = np.asarray(m_x.apply({"params": params}, x, deterministic=True))
        b = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        assert np.abs(a - b).max() < 0.05 * max(np.abs(a).max(), 1.0)

    @pytest.mark.experimental
    def test_masked_path_forward_parity(self, monkeypatch):
        """The masked [T, T] attention remains env-selectable
        (VST_MIDN_MASKED=1) for A/B measurement — keep it correct."""
        monkeypatch.setenv("VST_MIDN_MASKED", "1")
        x = self._data()
        m_x = self._build(False, jnp.bfloat16)
        m_f = self._build(True, jnp.bfloat16)
        params = m_x.init(jax.random.key(0), x[:2])["params"]
        a = np.asarray(m_x.apply({"params": params}, x, deterministic=True))
        b = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        assert np.abs(a - b).max() < 0.05 * max(np.abs(a).max(), 1.0)

    @pytest.mark.experimental
    def test_per_image_equals_masked_attention(self, monkeypatch):
        """Per-image and masked mid-N attention are the same math — fused
        outputs must agree to accumulation-order tolerance."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]
        monkeypatch.setenv("VST_MIDN_MASKED", "1")
        monkeypatch.setenv("VST_MIDN_TILE_ROWS", "400")
        a = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        monkeypatch.delenv("VST_MIDN_MASKED")
        b = np.asarray(m_f.apply({"params": params}, x, deterministic=True))
        assert np.abs(a - b).max() < 2e-2 * max(np.abs(a).max(), 1.0)

    @pytest.mark.experimental
    def test_batched_mode_forward_and_grads(self, monkeypatch):
        """The batched per-image mode (VST_MIDN_BATCHED=1, one 3-D dot per
        head) must match the unrolled per-image default in both the forward
        output and the parameter grads."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m_f.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        v_img, g_img = loss_and_grads()
        monkeypatch.setenv("VST_MIDN_BATCHED", "1")
        v_b, g_b = loss_and_grads()
        assert np.abs(v_img - v_b) < 1e-4 * max(abs(float(v_img)), 1.0)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_img),
            jax.tree_util.tree_leaves_with_path(g_b),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 2e-2 * sa

    def test_grouped_mode_forward_and_grads(self, monkeypatch):
        """Grouped per-image attention (VST_MIDN_GROUP=g: g adjacent images
        per block-masked dot) must match the ungrouped default in forward
        output and parameter grads."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m_f.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        v_img, g_img = loss_and_grads()
        monkeypatch.setenv("VST_MIDN_GROUP", "2")
        v_g, g_g = loss_and_grads()
        assert np.abs(v_img - v_g) < 1e-4 * max(abs(float(v_img)), 1.0)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_img),
            jax.tree_util.tree_leaves_with_path(g_g),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 2e-2 * sa

    @pytest.mark.parametrize("mode", ["1", "2"])
    def test_savep_spill_forward_and_grads(self, monkeypatch, mode):
        """The probs-spill backward (VST_MIDN_SAVEP, the shipped default:
        forward writes the per-image attention probs + output to HBM,
        backward skips the attention-forward recompute) must match the
        full-recompute backward (=0) in forward output and parameter
        grads. Mode 1 stores f32 probs (numerically identical math — _mm
        casts operands to bf16 at use anyway), mode 2 stores bf16 probs
        (a bf16 rounding of the dS term's probs)."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m_f.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        monkeypatch.setenv("VST_MIDN_SAVEP", "0")
        v_rc, g_rc = loss_and_grads()
        monkeypatch.setenv("VST_MIDN_SAVEP", mode)
        v_sp, g_sp = loss_and_grads()
        tol = 1e-5 if mode == "1" else 1e-3
        assert np.abs(v_rc - v_sp) < tol * max(abs(float(v_rc)), 1.0)
        gtol = 1e-4 if mode == "1" else 2e-2
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_rc),
            jax.tree_util.tree_leaves_with_path(g_sp),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < gtol * sa

    def test_savep_spill_with_grouping(self, monkeypatch):
        """Spill composes with the shipped image-grouped dots (the probs
        block layout must follow the group geometry, including the
        fallback to ungrouped when the group does not divide the tile's
        image count)."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m_f.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        monkeypatch.setenv("VST_MIDN_GROUP", "2")
        monkeypatch.setenv("VST_MIDN_SAVEP", "0")
        v_rc, g_rc = loss_and_grads()
        monkeypatch.setenv("VST_MIDN_SAVEP", "1")
        v_sp, g_sp = loss_and_grads()
        assert np.abs(v_rc - v_sp) < 1e-5 * max(abs(float(v_rc)), 1.0)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_rc),
            jax.tree_util.tree_leaves_with_path(g_sp),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 1e-4 * sa

    @pytest.mark.experimental
    def test_hybrid_mode_forward_and_grads(self, monkeypatch):
        """The split-stage hybrid (VST_P4_HYBRID=1: Pallas LN1+QKV, XLA
        attention, Pallas proj+LN2+MLP) must match the monolithic kernel in
        forward output and parameter grads to bf16-class tolerance."""
        x = self._data(b=8)
        m_f = self._build(True, jnp.float32)
        params = m_f.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m_f.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        v_mono, g_mono = loss_and_grads()
        monkeypatch.setenv("VST_P4_HYBRID", "1")
        v_h, g_h = loss_and_grads()
        assert np.abs(v_mono - v_h) < 1e-3 * max(abs(float(v_mono)), 1.0)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_mono),
            jax.tree_util.tree_leaves_with_path(g_h),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 3e-2 * sa

    def test_grads_at_least_as_accurate_as_xla_bf16(self):
        """Against an f32 ground truth, the fused kernel's grads must be no
        noisier than the XLA bf16 path's own grads (cancellation-heavy bias
        sums make naive fused-vs-XLA comparisons meaningless; measured: the
        kernel is ~2x closer to truth because cotangent sums stay f32)."""
        x = self._data()
        m32 = self._build(False, jnp.float32)
        m_x = self._build(False, jnp.bfloat16)
        m_f = self._build(True, jnp.bfloat16)
        params = m32.init(jax.random.key(0), x[:2])["params"]

        def g(m):
            return jax.grad(
                lambda p: jnp.mean(
                    m.apply({"params": p}, x, deterministic=True) ** 2
                )
            )(params)

        g32, gx, gf = g(m32), g(m_x), g(m_f)
        err_x = err_f = 0.0
        for a32, ax, af in zip(
            jax.tree.leaves(g32), jax.tree.leaves(gx), jax.tree.leaves(gf)
        ):
            a32 = np.asarray(a32, np.float32)
            s = np.abs(a32).max() + 1e-12
            err_x = max(err_x, np.abs(np.asarray(ax, np.float32) - a32).max() / s)
            err_f = max(err_f, np.abs(np.asarray(af, np.float32) - a32).max() / s)
        assert err_f <= 2.0 * err_x

    def test_tile_selection(self, monkeypatch):
        from vision_spectra_tpu.ops.block_fused import select_tile

        assert select_tile(512, 2) == 256
        # Mid-N row budget on the (default) per-image path is N-dependent:
        # 512 rows at N >= 32, 256 below (both measured, results/bench_midn).
        assert select_tile(16 * 50, 50) == 400  # k=8 divides batch 16
        assert select_tile(5 * 50, 50) == 250  # k=5 divides batch 5
        assert select_tile(4096 * 13, 13) == 208  # N=13 -> 256 budget, k=16
        assert select_tile(7 * 130, 130) is None  # N too large
        # The masked A/B path keeps its historical 256-row budget.
        monkeypatch.setenv("VST_MIDN_MASKED", "1")
        assert select_tile(16 * 50, 50) == 200  # k=4
        monkeypatch.delenv("VST_MIDN_MASKED")
        monkeypatch.setenv("VST_MIDN_TILE_ROWS", "256")
        assert select_tile(16 * 50, 50) == 200  # explicit budget override
        monkeypatch.delenv("VST_MIDN_TILE_ROWS")
        assert select_tile(250, 2) is None  # no 16-aligned divisor
        # Science-protocol batches: tile = whole batch (VERDICT r1 item 8).
        assert select_tile(64, 2) == 64
        assert select_tile(128, 2) == 128
        assert select_tile(96, 2) == 96
        assert select_tile(32, 2) == 32
        assert select_tile(320, 2) == 160  # largest 16-aligned divisor <= 256
        assert select_tile(8, 2) is None  # below sublane alignment


class TestMidNTokenPadding:
    """VST_MIDN_PAD=1 pads each image's token rows to a multiple of 8
    (50 -> 56) for sublane alignment — a measured loser on TPU
    (results/bench_p4_pad.py), kept env-gated; the full parity test is
    opt-in (-m experimental) per the quarantine policy, the cheap value
    tests stay default. Same math for real rows — dummy keys
    masked from every softmax, dummy rows carry zero cotangents — but the
    softmax row-sum reduces over 112 vs 100 columns, so identical values
    round differently at the ulp level (measured ~4e-9 at the probs,
    amplified to ~1e-3-relative worst-leaf grads through 2 blocks); a
    masking BUG would show at ~1e-1 relative."""

    def _model(self):
        from vision_spectra_tpu.models import build_vit

        m, _ = build_vit(
            "vit_tiny_patch4_28", num_classes=5, embed_dim=64, depth=2,
            num_heads=2, use_fused_blocks=True, dtype=jnp.float32,
        )
        return m

    @pytest.mark.experimental
    def test_padded_matches_unpadded(self, monkeypatch):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(8, 28, 28, 3).astype(np.float32))
        m = self._model()
        params = m.init(jax.random.key(0), x[:2])["params"]

        def loss_and_grads():
            def loss(p):
                out = m.apply({"params": p}, x, deterministic=True)
                return jnp.mean(out.astype(jnp.float32) ** 2)

            val, grads = jax.value_and_grad(loss)(params)
            return np.asarray(val), grads

        v_plain, g_plain = loss_and_grads()
        monkeypatch.setenv("VST_MIDN_PAD", "1")
        v_pad, g_pad = loss_and_grads()
        assert np.abs(v_plain - v_pad) < 1e-4 * max(abs(float(v_plain)), 1.0)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_plain),
            jax.tree_util.tree_leaves_with_path(g_pad),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 1e-2 * sa

    def test_padded_tokens_values(self, monkeypatch):
        from vision_spectra_tpu.ops.block_fused import padded_tokens

        monkeypatch.setenv("VST_MIDN_PAD", "1")
        assert padded_tokens(50) == 56
        assert padded_tokens(13) == 16
        assert padded_tokens(2) == 2  # pair path untouched
        assert padded_tokens(56) == 56  # already aligned
        assert padded_tokens(200) == 200  # out of mid-N range
        monkeypatch.setenv("VST_MIDN_PAD", "0")
        assert padded_tokens(50) == 50

    def test_padding_rejected_off_per_image_path(self, monkeypatch):
        from vision_spectra_tpu.ops.block_fused import _midn_mode_tag

        monkeypatch.setenv("VST_MIDN_MASKED", "1")
        with pytest.raises(ValueError, match="only supported"):
            _midn_mode_tag(56, 50)


class TestFusedDecoder:
    """The MIM decoder's blocks route through the fused whole-block kernel
    (round-5: the 2 XLA decoder blocks cost 100.9 ms of the 165.8 ms MIM
    step — nearly 2x the whole fused encoder; results/bench_mim_breakdown
    .py). Fused and XLA decoder paths must agree in output and grads."""

    def _setup(self, use_fused):
        from vision_spectra_tpu.models.mim import MIMDecoder

        return MIMDecoder(
            encoder_embed_dim=64, decoder_embed_dim=64, decoder_depth=2,
            decoder_num_heads=2, patch_size=4, num_channels=3,
            dtype=jnp.float32, use_fused_blocks=use_fused,
        )

    def test_fused_matches_xla_forward_and_grads(self):
        rng = np.random.RandomState(0)
        b, n_vis, n_tot = 8, 13, 49
        lat = jnp.asarray(rng.randn(b, n_vis, 64).astype(np.float32))
        ids = jnp.asarray(
            np.stack([rng.permutation(n_tot) for _ in range(b)]), jnp.int32)
        pos = jnp.asarray(rng.randn(1, n_tot + 1, 64).astype(np.float32) * 0.02)
        dec_x = self._setup(False)
        dec_f = self._setup(True)
        params = dec_x.init(jax.random.key(0), lat, ids, pos)["params"]

        def lg(dec):
            def loss(p):
                pred = dec.apply({"params": p}, lat, ids, pos)
                return jnp.mean(pred.astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(params)

        v_x, g_x = lg(dec_x)
        v_f, g_f = lg(dec_f)
        assert np.abs(np.asarray(v_x) - np.asarray(v_f)) < 1e-3 * max(
            abs(float(v_x)), 1e-3)
        for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_f),
        ):
            assert pa == pb
            sa = max(np.abs(np.asarray(ga)).max(), 1e-3)
            assert np.abs(np.asarray(ga) - np.asarray(gb)).max() < 2e-2 * sa, pa

    def test_gate_respects_init_and_geometry(self):
        from vision_spectra_tpu.models.vit import fused_stack_serves

        # 49 tokens, E=64: served on the forced path.
        assert fused_stack_serves(8, 49, 64, use_fused=True)
        # Oversized embed dim: refused.
        assert not fused_stack_serves(8, 49, 768, use_fused=True)
