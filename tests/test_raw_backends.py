"""Raw-file data backends exercised against synthesized fixtures (IDX,
CIFAR pickle batches, SVHN .mat) — the paths used when tfds is absent."""

import gzip
import os
import pickle
import struct

import numpy as np

from snngp.data import classification as C


def _write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        f.write(struct.pack(">" + "I" * arr.ndim, *arr.shape))
        f.write(arr.tobytes())


def test_idx_backend_roundtrip(tmp_path):
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = np.random.RandomState(0).randint(0, 256, (12, 28, 28), np.uint8)
    labels = np.arange(12, dtype=np.uint8) % 10
    _write_idx(str(d / "train-images-idx3-ubyte"), imgs)
    _write_idx(str(d / "train-labels-idx1-ubyte"), labels)
    x, y, nc = C._load_idx_dir(str(d), "train")
    assert x.shape == (12, 28, 28, 1) and nc == 10
    np.testing.assert_array_equal(y, labels)
    np.testing.assert_array_equal(x[..., 0], imgs)


def test_idx_backend_gz(tmp_path):
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = np.zeros((3, 4, 4), np.uint8)
    labels = np.array([1, 2, 3], np.uint8)
    raw_i = str(d / "t10k-images-idx3-ubyte")
    raw_l = str(d / "t10k-labels-idx1-ubyte")
    _write_idx(raw_i, imgs)
    _write_idx(raw_l, labels)
    for p in (raw_i, raw_l):
        with open(p, "rb") as f, gzip.open(p + ".gz", "wb") as g:
            g.write(f.read())
        os.remove(p)
    x, y, _ = C._load_idx_dir(str(d), "test")
    assert x.shape == (3, 4, 4, 1)


def test_emnist_backend_label_shift(tmp_path):
    d = tmp_path / "emnist"
    d.mkdir()
    imgs = np.zeros((4, 28, 28), np.uint8)
    labels = np.array([1, 5, 26, 2], np.uint8)  # EMNIST letters: 1-indexed
    _write_idx(str(d / "emnist-letters-train-images-idx3-ubyte"), imgs)
    _write_idx(str(d / "emnist-letters-train-labels-idx1-ubyte"), labels)
    x, y, nc = C._load_idx_dir(str(d), "train", names=C._EMNIST_FILES,
                               num_class=26, label_offset=-1)
    assert nc == 26
    np.testing.assert_array_equal(y, [0, 4, 25, 1])


def test_cifar10_pickle_backend(tmp_path):
    d = tmp_path / "cifar10" / "cifar-10-batches-py"
    d.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(1, 6):
        payload = {b"data": rng.randint(0, 256, (5, 3072), np.uint8),
                   b"labels": list(rng.randint(0, 10, 5))}
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump(payload, f)
    x, y, nc = C._load_cifar10_dir(str(tmp_path / "cifar10"), "train")
    assert x.shape == (25, 32, 32, 3) and y.shape == (25,) and nc == 10


def test_svhn_mat_backend(tmp_path):
    from scipy.io import savemat
    d = tmp_path / "svhn_cropped"
    d.mkdir()
    rng = np.random.RandomState(2)
    X = rng.randint(0, 256, (32, 32, 3, 6), np.uint8)
    y = np.array([[10], [1], [2], [9], [10], [5]])  # '10' encodes digit 0
    savemat(str(d / "test_32x32.mat"), {"X": X, "y": y})
    x, yy, nc = C._load_svhn_dir(str(d), "test")
    assert x.shape == (6, 32, 32, 3) and nc == 10
    np.testing.assert_array_equal(yy, [0, 1, 2, 9, 0, 5])


def test_synthetic32_shape_and_8x8_stream_unchanged():
    """synthetic32 is CIFAR-shaped; the 8x8 stream is bit-identical to the
    ungeneralized loader (round-1 golden determinism)."""
    x8, y8, nc = C._load_synthetic("test")
    assert x8.shape == (1024, 8, 8, 1) and nc == 10
    # pinned from the round-1 loader (first image checksum + labels head)
    assert int(x8[0].sum()) == 2922
    assert list(y8[:8]) == [2, 8, 2, 1, 7, 5, 9, 2]
    x32, y32, nc32 = C._load_synthetic("test", shape=(32, 32, 3))
    assert x32.shape == (1024, 32, 32, 3) and nc32 == 10
    np.testing.assert_array_equal(y8, y32)  # same label stream
    # blob geometry scales: class blob peaks in the same relative cell
    i = int(np.argmax(y32 == 7))
    p8 = np.unravel_index(np.argmax(x8[np.argmax(y8 == 7), :, :, 0]), (8, 8))
    p32 = np.unravel_index(np.argmax(x32[i, :, :, 0]), (32, 32))
    assert abs(p32[0] / 4 - p8[0]) <= 1 and abs(p32[1] / 4 - p8[1]) <= 1


def test_synthetic32_parse_and_load():
    (base, detail, option), clean = C.parse_dataset("synthetic32")
    assert base == "synthetic32" and detail == "default"
    x, y, nc = C._load_raw("synthetic32", "train", "./data")
    assert x.shape == (4096, 32, 32, 3) and nc == 10
