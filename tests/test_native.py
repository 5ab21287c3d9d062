"""Native (C++) rasterizer tests — skipped when no toolchain is available."""

import numpy as np
import pytest

from vision_spectra_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native rasterizer not built"
)


class TestMt19937Parity:
    @pytest.mark.parametrize("seed", [0, 42, 123456])
    def test_bounded_draws_match_numpy(self, seed):
        rng = np.random.RandomState(seed)
        np_draws = rng.randint(0, 5, size=50)
        cpp = native.mt19937_randint(seed, 0, 5, 50)
        np.testing.assert_array_equal(np_draws, cpp.astype(np.int64))

    def test_large_range(self):
        rng = np.random.RandomState(7)
        np_draws = rng.randint(0, 2**31, size=50)
        cpp = native.mt19937_randint(7, 0, 2**31, 50)
        np.testing.assert_array_equal(np_draws, cpp.astype(np.int64))


class TestNativeSplit:
    def test_labels_match_pil_path(self):
        from vision_spectra_tpu.data.synthetic import generate_split

        pil = generate_split(32, 3, seed=42, backend="pil")
        nat = generate_split(32, 3, seed=42, backend="native")
        np.testing.assert_array_equal(pil.labels, nat.labels)

    def test_backgrounds_identical(self):
        """Same RNG stream → identical background colors (corner pixels)."""
        from vision_spectra_tpu.data.synthetic import generate_split

        pil = generate_split(16, 5, seed=11, backend="pil")
        nat = generate_split(16, 5, seed=11, backend="native")
        np.testing.assert_array_equal(pil.images[:, 0, 0, :], nat.images[:, 0, 0, :])

    def test_shapes_statistically_equivalent(self):
        """Shape masks overlap strongly with the PIL rendering (IoU ≥ 0.6)."""
        from vision_spectra_tpu.data.synthetic import generate_split

        pil = generate_split(24, 5, seed=3, backend="pil")
        nat = generate_split(24, 5, seed=3, backend="native")
        for a, b in zip(pil.images, nat.images):
            ma = a.max(-1) >= 140
            mb = b.max(-1) >= 140
            iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
            assert iou >= 0.6

    def test_deterministic(self):
        a = native.generate_split_native(8, 3, 28, 3, 5)
        b = native.generate_split_native(8, 3, 28, 3, 5)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_grayscale(self):
        imgs, labels = native.generate_split_native(4, 2, 28, 1, 0)
        assert imgs.shape == (4, 28, 28, 1)
