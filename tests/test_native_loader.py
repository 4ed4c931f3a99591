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
