"""Loss-zoo tests (mirrors reference tests/test_losses.py analytical oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vision_spectra_tpu.config import LossConfig, LossName, MIMLossName
from vision_spectra_tpu.losses import (
    cauchy_loss,
    class_balanced_weights,
    cross_entropy_loss,
    focal_loss,
    get_loss,
    get_mim_loss,
    huber_loss,
    l1_loss,
    label_smoothing_loss,
    make_label_smoothing,
    make_sgt,
    mse_loss,
    register_loss,
    sgt_loss,
    smooth_l1_loss,
    tukey_loss,
)


@pytest.fixture
def logits_labels():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(16, 5).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(0, 5, 16))
    return logits, labels


class TestFocal:
    def test_gamma_zero_equals_ce(self, logits_labels):
        logits, labels = logits_labels
        ce = cross_entropy_loss(logits, labels)
        fl = focal_loss(logits, labels, gamma=0.0)
        assert float(fl) == pytest.approx(float(ce), rel=1e-5)

    def test_higher_gamma_downweights_easy(self):
        # confident correct prediction => easy sample
        logits = jnp.array([[3.0, -3.0], [3.0, -3.0]])
        labels = jnp.array([0, 0])
        l0 = float(focal_loss(logits, labels, gamma=0.0))
        l2 = float(focal_loss(logits, labels, gamma=2.0))
        assert l2 < l0

    def test_scalar_alpha_scales(self, logits_labels):
        logits, labels = logits_labels
        base = float(focal_loss(logits, labels, gamma=2.0))
        scaled = float(focal_loss(logits, labels, gamma=2.0, alpha=0.25))
        assert scaled == pytest.approx(0.25 * base, rel=1e-5)

    def test_per_class_alpha(self, logits_labels):
        logits, labels = logits_labels
        alpha = np.array([1.0, 2.0, 0.5, 1.0, 1.0], np.float32)
        v = focal_loss(logits, labels, gamma=1.0, alpha=alpha)
        assert np.isfinite(float(v))


class TestLabelSmoothing:
    def test_epsilon_zero_equals_ce(self, logits_labels):
        logits, labels = logits_labels
        ce = cross_entropy_loss(logits, labels)
        ls = label_smoothing_loss(logits, labels, epsilon=0.0)
        assert float(ls) == pytest.approx(float(ce), rel=1e-5)

    def test_invalid_epsilon_raises(self):
        with pytest.raises(ValueError):
            make_label_smoothing(epsilon=1.0)
        with pytest.raises(ValueError):
            make_label_smoothing(epsilon=-0.1)

    def test_smoothing_increases_loss_for_confident(self):
        logits = jnp.array([[10.0, -10.0, -10.0]])
        labels = jnp.array([0])
        l0 = float(label_smoothing_loss(logits, labels, epsilon=0.0))
        l1 = float(label_smoothing_loss(logits, labels, epsilon=0.2))
        assert l1 > l0


class TestClassBalanced:
    def test_minority_weight_higher(self):
        w = class_balanced_weights([1000, 10], beta=0.999)
        assert w[1] > w[0]

    def test_weights_sum_to_num_classes(self):
        w = class_balanced_weights([100, 10, 1], beta=0.99)
        assert w.sum() == pytest.approx(3.0, rel=1e-5)

    def test_registry_requires_counts(self):
        cfg = LossConfig(classification=LossName.CLASS_BALANCED)
        with pytest.raises(ValueError):
            get_loss(cfg, samples_per_class=None)

    def test_via_registry(self, logits_labels):
        logits, labels = logits_labels
        cfg = LossConfig(classification=LossName.CLASS_BALANCED)
        fn = get_loss(cfg, samples_per_class=[100, 50, 20, 10, 5])
        assert np.isfinite(float(fn(logits, labels)))


class TestAsymmetric:
    def test_finite_and_positive(self, logits_labels):
        logits, labels = logits_labels
        cfg = LossConfig(classification=LossName.ASYMMETRIC)
        fn = get_loss(cfg)
        v = float(fn(logits, labels))
        assert np.isfinite(v) and v > 0

    def test_accepts_multihot(self):
        from vision_spectra_tpu.losses import asymmetric_loss

        logits = jnp.zeros((4, 3))
        targets = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1, 2, 0]])
        assert np.isfinite(float(asymmetric_loss(logits, targets)))


class TestRegistry:
    def test_all_losses_dispatch(self, logits_labels):
        logits, labels = logits_labels
        for name in LossName:
            cfg = LossConfig(classification=name)
            counts = [10, 10, 10, 10, 10] if name == LossName.CLASS_BALANCED else None
            fn = get_loss(cfg, samples_per_class=counts)
            assert np.isfinite(float(fn(logits, labels)))

    def test_mim_registry(self):
        pred = jnp.ones((2, 4, 8))
        target = jnp.zeros((2, 4, 8))
        for name in MIMLossName:
            fn = get_mim_loss(LossConfig(mim=name))
            assert float(fn(pred, target)) > 0

    def test_register_custom(self, logits_labels):
        logits, labels = logits_labels
        register_loss("constant", lambda: (lambda lo, la: jnp.float32(1.0)))
        from vision_spectra_tpu.losses import LOSS_REGISTRY

        assert "constant" in LOSS_REGISTRY
        with pytest.raises(TypeError):
            register_loss("bad", "not-callable")


class TestReconstruction:
    def _data(self):
        rng = np.random.RandomState(1)
        pred = jnp.asarray(rng.randn(4, 6, 8).astype(np.float32))
        target = jnp.asarray(rng.randn(4, 6, 8).astype(np.float32))
        mask = jnp.asarray((rng.rand(4, 6) > 0.5).astype(np.float32))
        return pred, target, mask

    def test_mse_identity(self):
        x = jnp.ones((3, 4))
        assert float(mse_loss(x, x)) == 0.0

    def test_masked_path(self):
        pred, target, mask = self._data()
        for fn in (mse_loss, l1_loss, smooth_l1_loss, cauchy_loss, huber_loss, tukey_loss, sgt_loss):
            v = float(fn(pred, target, mask))
            assert np.isfinite(v) and v >= 0

    def test_masked_equals_manual(self):
        pred, target, mask = self._data()
        per = np.mean((np.asarray(pred) - np.asarray(target)) ** 2, axis=-1)
        manual = (per * np.asarray(mask)).sum() / np.asarray(mask).sum()
        assert float(mse_loss(pred, target, mask)) == pytest.approx(manual, rel=1e-5)

    def test_cauchy_more_robust_than_mse(self):
        """Outlier inflates Cauchy less than MSE (reference :346-371)."""
        base_pred = jnp.zeros((10,))
        base_target = jnp.full((10,), 0.1)
        out_target = base_target.at[0].set(50.0)
        mse_ratio = float(mse_loss(base_pred, out_target)) / float(
            mse_loss(base_pred, base_target)
        )
        cauchy_ratio = float(cauchy_loss(base_pred, out_target)) / float(
            cauchy_loss(base_pred, base_target)
        )
        assert cauchy_ratio < mse_ratio

    def test_tukey_rejects_outliers(self):
        """Loss saturates at c²/6 for huge residuals."""
        pred = jnp.zeros((4,))
        target = jnp.array([100.0, 200.0, 300.0, 400.0])
        c = 4.685
        assert float(tukey_loss(pred, target)) == pytest.approx(c * c / 6, rel=1e-5)

    def test_huber_transition(self):
        """Quadratic below delta, linear above."""
        delta = 1.0
        small = float(huber_loss(jnp.zeros(1), jnp.array([0.5]), delta=delta))
        assert small == pytest.approx(0.5 * 0.25, rel=1e-5)
        large = float(huber_loss(jnp.zeros(1), jnp.array([3.0]), delta=delta))
        assert large == pytest.approx(1.0 * (3.0 - 0.5), rel=1e-5)

    def test_smooth_l1_matches_huber_at_beta_one(self):
        pred, target, _ = self._data()
        assert float(smooth_l1_loss(pred, target, beta=1.0)) == pytest.approx(
            float(huber_loss(pred, target, delta=1.0)), rel=1e-5
        )

    def test_param_validation(self):
        with pytest.raises(ValueError):
            cauchy_loss(jnp.zeros(1), jnp.zeros(1), gamma=0.0)
        with pytest.raises(ValueError):
            huber_loss(jnp.zeros(1), jnp.zeros(1), delta=-1.0)
        with pytest.raises(ValueError):
            tukey_loss(jnp.zeros(1), jnp.zeros(1), c=0.0)
        with pytest.raises(ValueError):
            make_sgt(p=-1.0)
        with pytest.raises(ValueError):
            make_sgt(lam=1.5)

    def test_sgt_symmetric_at_lam_zero(self):
        pred = jnp.zeros((5,))
        up = sgt_loss(pred, jnp.full((5,), 2.0))
        down = sgt_loss(pred, jnp.full((5,), -2.0))
        assert float(up) == pytest.approx(float(down), rel=1e-5)


class TestWeightedCE:
    def test_class_weights_torch_semantics(self, logits_labels):
        logits, labels = logits_labels
        w = np.array([1.0, 2.0, 1.0, 1.0, 1.0], np.float32)
        v = cross_entropy_loss(logits, labels, weight=jnp.asarray(w))
        # torch: sum(w_y * ce) / sum(w_y)
        import jax

        logp = np.asarray(jax.nn.log_softmax(np.asarray(logits), axis=-1))
        ce = -logp[np.arange(16), np.asarray(labels)]
        wy = w[np.asarray(labels)]
        assert float(v) == pytest.approx((wy * ce).sum() / wy.sum(), rel=1e-5)
