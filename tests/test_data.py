"""Data-pipeline tests: ImageNet ingestion (JPEG folder + arrays) and the
on-device accuracy datasets (digits / synth10)."""
import os

import numpy as np
import pytest

from shiftedscalequantization_tpu.data import imagenet_io as inio
from shiftedscalequantization_tpu.data.datasets import build_digits_data, \
    build_imagenet_data, build_synth10_data


@pytest.fixture()
def jpeg_root(tmp_path):
    """Tiny ImageFolder fixture: 2 classes x 3 images per split, odd sizes
    to exercise the resize/crop math."""
    from PIL import Image
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, cls in enumerate(("n01440764", "n01443537")):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                h, w = 260 + 7 * i + 30 * ci, 300 - 11 * i
                arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.JPEG")
    return str(tmp_path)


class TestImageFolder:
    def test_val_shapes_and_normalization(self, jpeg_root):
        train, test = build_imagenet_data(batch_size=4, data_path=jpeg_root)
        xb, yb = next(iter(test))
        assert xb.shape == (4, 224, 224, 3) and xb.dtype == np.float32
        assert yb.dtype == np.int32 and set(yb) <= {0, 1}
        # normalized: uniform-uint8 pixels -> mean near (0.5-mean)/std
        want = ((0.5 - inio.IMAGENET_MEAN) / inio.IMAGENET_STD)
        np.testing.assert_allclose(xb.mean(axis=(0, 1, 2)), want, atol=0.05)
        assert len(test) == 2  # 6 images / bs 4

    def test_train_transform_is_random_crop(self, jpeg_root):
        train, _ = build_imagenet_data(batch_size=6, data_path=jpeg_root)
        xb, yb = next(iter(train))
        assert xb.shape == (6, 224, 224, 3)
        xb2, _ = next(iter(train))  # fresh iterator, same seed -> same crops
        np.testing.assert_array_equal(xb, xb2)

    def test_val_transform_center_crop_math(self, jpeg_root):
        """Resize-shorter-256 + center-crop equals the hand-computed slice
        (reference data/imagenet.py:27-32)."""
        from PIL import Image
        p = os.path.join(jpeg_root, "val", "n01440764", "img_0.JPEG")
        with Image.open(p) as img:
            out = inio.val_transform(img)
            img2 = img.convert("RGB")
            w, h = img2.size
        assert out.shape == (224, 224, 3)
        # shorter side maps to 256
        scale = 256 / min(w, h)
        assert round(min(w, h) * scale) == 256


class TestArrayIngestion:
    def test_npz_uint8_gets_transform(self, tmp_path):
        rng = np.random.default_rng(1)
        for split, n in (("train", 6), ("val", 4)):
            imgs = rng.integers(0, 256, size=(n, 300, 280, 3), dtype=np.uint8)
            labels = rng.integers(0, 10, size=(n,))
            np.savez(tmp_path / f"{split}.npz", images=imgs, labels=labels)
        train, test = build_imagenet_data(batch_size=2,
                                          data_path=str(tmp_path))
        xb, yb = next(iter(test))
        assert xb.shape == (2, 224, 224, 3)
        assert np.isfinite(xb).all()

    def test_float32_passthrough_and_shards(self, tmp_path):
        rng = np.random.default_rng(2)
        (tmp_path / "train").mkdir()
        for i in range(2):
            np.savez(tmp_path / "train" / f"shard{i}.npz",
                     images=rng.normal(size=(3, 224, 224, 3)).astype(
                         np.float32),
                     labels=np.arange(3))
        np.savez(tmp_path / "val.npz",
                 images=rng.normal(size=(4, 224, 224, 3)).astype(np.float32),
                 labels=np.arange(4))
        x, y = inio.load_array_split(str(tmp_path), "train")
        assert x.shape == (6, 224, 224, 3) and y.shape == (6,)
        train, test = build_imagenet_data(batch_size=3,
                                          data_path=str(tmp_path))
        assert sum(1 for _ in train) == 2


class TestOnDeviceDatasets:
    def test_digits_loader(self):
        train, test = build_digits_data(batch_size=64)
        xb, yb = next(iter(train))
        assert xb.shape == (64, 32, 32, 3)
        n_test = sum(b[0].shape[0] for b in test)
        assert n_test == 359

    def test_synth10_loader_calibration_disjoint_from_test(self):
        train, test = build_synth10_data(batch_size=32, n_train=64, n_test=64)
        xtr, _ = next(iter(train))
        xte, _ = next(iter(test))
        assert xtr.shape == (32, 32, 32, 3)
        assert float(np.abs(xtr[:32] - xte[:32]).max()) > 0

    def test_synth10_labels_balanced_and_deterministic(self):
        from shiftedscalequantization_tpu.data.realdata import \
            synth10_test_arrays
        x1, y1 = synth10_test_arrays(512, seed=3)
        x2, y2 = synth10_test_arrays(512, seed=3)
        np.testing.assert_array_equal(y1, y2)
        np.testing.assert_allclose(x1, x2)
        counts = np.bincount(y1, minlength=10)
        assert counts.min() > 20  # roughly balanced
