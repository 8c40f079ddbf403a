"""Data-layer tests: name grammar, transforms (ood/imbalanced/noisy_label),
normalization stats, regression split pipeline determinism."""

import numpy as np
import pytest

from snngp.data import classification as C
from snngp.data import regression as R


def test_parse_dataset_grammar():
    (base, detail, option), clean = C.parse_dataset("mnist")
    assert (base, detail, option) == ("mnist", "default", None)
    (base, detail, option), clean = C.parse_dataset("cifar10/ood/1,2")
    assert base == "cifar10" and detail == "ood" and option == [1, 2]
    assert clean == "cifar10/ood/1,2"
    (_, detail, option), clean = C.parse_dataset("svhn/imbalanced/exp0.7")
    assert detail == "imbalanced" and option == ("exp", 0.7)
    (_, detail, option), _ = C.parse_dataset("kmnist/noisy_label/0.25")
    assert option == 0.25
    with pytest.raises(ValueError):
        C.parse_dataset("nope/default")


def test_ood_transform_drops_classes():
    (x, y), (xv, yv), (nc, name, msg) = C.get_train_dataset(
        "synthetic/ood/1,2", num_data=400, valid_prop=0.1, normalize=False)
    assert 1 not in y and 2 not in y
    assert 1 not in yv and 2 not in yv


def test_noisy_label_transform_is_seeded():
    a = C.get_train_dataset("synthetic/noisy_label/0.3", num_data=300,
                            valid_prop=0.1, normalize=False, seed=3)
    b = C.get_train_dataset("synthetic/noisy_label/0.3", num_data=300,
                            valid_prop=0.1, normalize=False, seed=3)
    np.testing.assert_array_equal(a[0][1], b[0][1])
    assert "noisy labels" in a[2][2]


def test_imbalanced_transform_counts():
    (x, y), (xv, yv), (nc, name, msg) = C.get_train_dataset(
        "synthetic/imbalanced/exp0.5", valid_prop=0.1, normalize=False)
    counts = np.bincount(y, minlength=nc)
    # exp profile: later classes get more data (factor 0.5).
    assert counts[-1] > counts[0]
    # validation stays class-balanced.
    vcounts = np.bincount(yv, minlength=nc)
    assert vcounts.max() == vcounts.min()


def test_normalize_stats():
    x = np.full((4, 2, 2, 1), 0.75)
    out = C.normalize_dataset("mnist/default", x)
    np.testing.assert_allclose(out, (0.75 - 0.5) / 0.5)
    x3 = np.full((2, 2, 2, 3), 0.5)
    out3 = C.normalize_dataset("cifar10/default", x3)
    np.testing.assert_allclose(out3[..., 0], (0.5 - 0.4914) / 0.2023, rtol=1e-6)


def test_onehot_and_test_split():
    (x, y), (nc, name) = C.get_test_dataset("synthetic", num_data=64,
                                            normalize=True, onehot=True)
    assert y.shape == (64, nc)
    np.testing.assert_allclose(y.sum(axis=1), 1.0)


def test_regression_synthetic_bit_exact():
    x1, y1 = R.get_dataset("syn-normal")
    x2, y2 = R.get_dataset("syn-normal")
    np.testing.assert_array_equal(y1, y2)
    assert x1.shape == (100, 1) and y1.shape == (100,)
    xt, yt = R.get_dataset("syn-t")
    assert xt.shape == (300, 1)


def test_split_dataset_normalization_and_determinism():
    x = np.arange(100, dtype=np.float64).reshape(50, 2)
    y = np.arange(50, dtype=np.float64)
    (xt, yt), (xv, yv), (xs, ys), (y_std, y_mean) = R.split_dataset(
        x, y, 0.8, 0.1, 0.1)
    assert xt.shape == (40, 2) and xv.shape == (5, 2) and xs.shape == (5, 2)
    np.testing.assert_allclose(xt.mean(axis=0), 0.0, atol=1e-12)
    np.testing.assert_allclose(yt.std(), 1.0, rtol=1e-12)
    # de-normalization round-trips
    np.testing.assert_allclose(yt * y_std + y_mean, y[:40])


def test_permute_dataset_seeded():
    x = np.arange(10)[:, None]
    y = np.arange(10)
    x1, y1 = R.permute_dataset(x, y, seed=5)
    x2, y2 = R.permute_dataset(x, y, seed=5)
    np.testing.assert_array_equal(y1, y2)
    assert not np.array_equal(y1, y)


def test_boston_loader_uci_layout(tmp_path):
    """housing.data (one 14-col record per line) parses to (N,13) + (N,)."""
    from snngp.data.regression import get_dataset

    rows = np.random.RandomState(3).rand(5, 14)
    d = tmp_path / "boston"
    d.mkdir()
    with open(d / "housing.data", "w") as f:
        for r in rows:
            f.write(" ".join(f"{v:9.5f}" for v in r) + "\n")
    x, y = get_dataset("boston", root=str(tmp_path))
    assert x.shape == (5, 13) and y.shape == (5,)
    np.testing.assert_allclose(x, rows[:, :13], atol=1e-5)
    np.testing.assert_allclose(y, rows[:, 13], atol=1e-5)


def test_boston_loader_statlib_layout(tmp_path):
    """StatLib dump: prose header + records wrapped over two lines (11+3)."""
    from snngp.data.regression import _parse_boston_file

    rows = np.random.RandomState(4).rand(4, 14)
    path = tmp_path / "boston"
    with open(path, "w") as f:
        f.write("The Boston house-price data of Harrison, D.\n")
        f.write("Variables in order:\n CRIM per capita crime rate\n\n")
        for r in rows:
            f.write(" ".join(f"{v:8.4f}" for v in r[:11]) + "\n")
            f.write(" ".join(f"{v:8.4f}" for v in r[11:]) + "\n")
    x, y = _parse_boston_file(str(path))
    assert x.shape == (4, 13)
    np.testing.assert_allclose(x, rows[:, :13], atol=1e-4)
    np.testing.assert_allclose(y, rows[:, 13], atol=1e-4)


def test_boston_loader_rejects_ragged(tmp_path):
    from snngp.data.regression import _parse_boston_file
    path = tmp_path / "bad"
    path.write_text("1.0 2.0 3.0\n")
    try:
        _parse_boston_file(str(path))
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_host_bilinear_resize_matches_jax_image_resize():
    """snngp.data.resize.bilinear_resize is the host-side drop-in for the
    reference's device resize (classification/train.py:156-161): 1-ULP match
    across down/up/non-integer factors."""
    import jax
    import jax.numpy as jnp

    from snngp.data.resize import bilinear_resize

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(32, 32, 16, 16), (28, 28, 14, 14),
                           (16, 16, 32, 32), (28, 28, 16, 16),
                           (32, 32, 8, 8)]:
        x = rng.rand(4, h, w, 3).astype(np.float32)
        want = np.asarray(jax.image.resize(jnp.asarray(x), (4, oh, ow, 3),
                                           method="bilinear"))
        got = bilinear_resize(x, oh, ow)
        np.testing.assert_allclose(got, want, atol=3e-7)
