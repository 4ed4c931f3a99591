"""Native C++ data pipeline vs the python ArrayLoader."""
import numpy as np
import pytest

from shiftedscalequantization_tpu.data.datasets import ArrayLoader
from shiftedscalequantization_tpu.data.native_loader import NativeLoader, \
    native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(100, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 100).astype(np.int32)
    return images, labels


class TestNativeLoader:
    def test_sequential_matches_python(self, data):
        images, labels = data
        nat = NativeLoader(images, labels, batch_size=32)
        py = ArrayLoader(images, labels, batch_size=32)
        nb, pb = list(nat), list(py)
        assert len(nb) == len(pb) == 4
        for (ni, nl), (pi, pl) in zip(nb, pb):
            np.testing.assert_array_equal(ni, pi)
            np.testing.assert_array_equal(nl, pl)

    def test_reiterable(self, data):
        images, labels = data
        nat = NativeLoader(images, labels, batch_size=50)
        a = [l.copy() for _, l in nat]
        b = [l.copy() for _, l in nat]
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))

    def test_sharding_partitions(self, data):
        images, labels = data
        seen = []
        for rank in range(4):
            nat = NativeLoader(images, labels, batch_size=16,
                               shard=(rank, 4))
            seen.append(np.concatenate([l for _, l in nat]))
        total = np.concatenate(seen)
        assert total.size == 100
        np.testing.assert_array_equal(np.sort(total), np.sort(labels))

    def test_shuffle_deterministic(self, data):
        images, labels = data
        a = NativeLoader(images, labels, batch_size=100, shuffle=True, seed=7)
        b = NativeLoader(images, labels, batch_size=100, shuffle=True, seed=7)
        (la,), (lb,) = [l for _, l in a], [l for _, l in b]
        np.testing.assert_array_equal(la, lb)
        c = NativeLoader(images, labels, batch_size=100, shuffle=True, seed=8)
        (lc,) = [l for _, l in c]
        assert not np.array_equal(la, lc)

    def test_u8_normalization(self):
        rng = np.random.default_rng(1)
        images = rng.integers(0, 256, (20, 4, 4, 3)).astype(np.uint8)
        labels = np.zeros(20, np.int32)
        mean = np.array([0.5, 0.4, 0.3], np.float32)
        std = np.array([0.2, 0.25, 0.3], np.float32)
        nat = NativeLoader(images, labels, batch_size=20, mean=mean, std=std)
        (got, _), = list(nat)
        want = (images / 255.0 - mean) / std
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_drop_last(self, data):
        images, labels = data
        nat = NativeLoader(images, labels, batch_size=32, drop_last=True)
        assert len(list(nat)) == 3


class TestNativeJpeg:
    """Native libjpeg decode + triangle-resample val transform vs the
    PIL-backed imagenet_io reference implementation."""

    def _make_tree(self, tmp_path, n_cls=2, per_cls=3):
        from PIL import Image
        rng = np.random.default_rng(0)
        paths, labels = [], []
        for ci in range(n_cls):
            d = tmp_path / "val" / f"class{ci}"
            d.mkdir(parents=True)
            for j in range(per_cls):
                h, w = int(rng.integers(80, 300)), int(rng.integers(80, 300))
                arr = rng.integers(0, 256, (h, w, 3), np.uint8)
                p = d / f"img{j}.jpeg"
                Image.fromarray(arr).save(p, quality=95)
                paths.append(str(p))
                labels.append(ci)
        return paths, np.asarray(labels, np.int32)

    def test_matches_pil_val_transform(self, tmp_path):
        from shiftedscalequantization_tpu.data.native_loader import \
            NativeJpegLoader, jpeg_available
        from shiftedscalequantization_tpu.data.imagenet_io import \
            val_transform
        if not jpeg_available():
            import pytest
            pytest.skip("native jpeg loader not built")
        from PIL import Image
        paths, labels = self._make_tree(tmp_path)
        ld = NativeJpegLoader(paths, labels, batch_size=3, input_size=64,
                              resize=96, threads=2)
        got_x, got_y = [], []
        for xb, yb in ld:
            got_x.append(xb)
            got_y.append(yb)
        got_x = np.concatenate(got_x)
        got_y = np.concatenate(got_y)
        assert got_x.shape == (len(paths), 64, 64, 3)
        np.testing.assert_array_equal(got_y, labels)
        for i, p in enumerate(paths):
            with Image.open(p) as img:
                # PIL reference with the same resize/crop sizes
                from shiftedscalequantization_tpu.data import imagenet_io as io2
                img = img.convert("RGB")
                r = io2._resize_shorter(img, 96)
                r = io2._center_crop(r, 64)
                want = io2._normalize(np.asarray(r))
            # PIL resamples in fixed point (8-bit coeffs); the native path
            # is float — allow a few LSBs through the normalize
            diff = np.abs(got_x[i] - want)
            assert diff.mean() < 0.02 and diff.max() < 0.25, \
                (i, diff.mean(), diff.max())

    def test_shard_and_num_batches(self, tmp_path):
        from shiftedscalequantization_tpu.data.native_loader import \
            NativeJpegLoader, jpeg_available
        if not jpeg_available():
            import pytest
            pytest.skip("native jpeg loader not built")
        paths, labels = self._make_tree(tmp_path, n_cls=2, per_cls=4)
        a = NativeJpegLoader(paths, labels, batch_size=2, input_size=32,
                             resize=48, shard=(0, 2))
        b = NativeJpegLoader(paths, labels, batch_size=2, input_size=32,
                             resize=48, shard=(1, 2))
        ya = np.concatenate([y for _, y in a])
        yb = np.concatenate([y for _, y in b])
        assert len(ya) + len(yb) == len(paths)
        assert sorted(np.concatenate([ya, yb]).tolist()) == \
            sorted(labels.tolist())

    def test_build_imagenet_data_uses_native_val(self, tmp_path):
        """ImageFolder mounts route the val split through the native C++
        JPEG pipeline when the library is built."""
        from shiftedscalequantization_tpu.data.native_loader import \
            NativeJpegLoader, jpeg_available
        if not jpeg_available():
            import pytest
            pytest.skip("native jpeg loader not built")
        from shiftedscalequantization_tpu.data.datasets import \
            build_imagenet_data
        from PIL import Image
        rng = np.random.default_rng(1)
        for split in ("train", "val"):
            for ci in range(2):
                d = tmp_path / split / f"n{ci:08d}"
                d.mkdir(parents=True)
                for j in range(2):
                    arr = rng.integers(0, 256, (70, 90, 3), np.uint8)
                    Image.fromarray(arr).save(d / f"x{j}.jpeg")
        train, test = build_imagenet_data(
            batch_size=2, data_path=str(tmp_path), input_size=64)
        assert isinstance(test, NativeJpegLoader)
        xb, yb = next(iter(test))
        assert xb.shape == (2, 64, 64, 3) and xb.dtype == np.float32
        xt, yt = next(iter(train))
        assert xt.shape == (2, 64, 64, 3)
