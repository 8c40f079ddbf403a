"""Loader-confidence fixtures for every raw format the data backends claim
(VERDICT r2 Next #5).

Each test synthesizes a tiny file in the EXACT upstream format (separators,
headers, prose preambles, nested directories) and round-trips it through
``snngp.data.regression.get_dataset`` + ``split_dataset``, so the day real
files appear the pipeline is known-good. Format semantics mirror the
reference loaders (/root/reference/experiments/regression/data.py:120-241),
including their header quirks: naval/yacht use pandas' default header=0 on
headerless files (the first record becomes the header — reference behavior,
preserved for parity).

Classification raw backends (IDX/CIFAR/SVHN) are covered in
test_raw_backends.py; here we add the get_train_dataset round-trip.
"""

import os

import numpy as np
import pytest

from snngp.data import regression as R


def _round_trip(name, root, nx, n_rows):
    x, y = R.get_dataset(name, root=str(root))
    assert x.shape == (n_rows, nx), (x.shape, n_rows, nx)
    assert y.shape == (n_rows,)
    assert np.isfinite(np.asarray(x, np.float64)).all()
    assert np.isfinite(np.asarray(y, np.float64)).all()
    # Downstream split/normalize path (reference data.py:244-289).
    splits = R.split_dataset(x.astype(np.float64), y.astype(np.float64),
                             0.8, 0.1, 0.1)
    (x_tr, y_tr), (x_va, y_va), (x_te, y_te) = splits[:3]
    assert x_tr.shape[0] + x_va.shape[0] + x_te.shape[0] == n_rows
    return x, y


def _rows(n, cols, seed, sep=",", fmt="%.4f"):
    rng = np.random.RandomState(seed)
    # Pre-round so the written text round-trips exactly.
    data = np.round(rng.rand(n, cols) * 10, 4)
    return data, "\n".join(sep.join(fmt % v for v in row) for row in data)


def test_kin8nm_openml_csv(tmp_path):
    d = tmp_path / "kin8nm"
    d.mkdir()
    data, body = _rows(20, 9, 0)
    header = ",".join([f"theta{i}" for i in range(1, 9)] + ["y"])
    (d / "dataset_2175_kin8nm.csv").write_text(header + "\n" + body + "\n")
    x, y = _round_trip("kin8nm", tmp_path, 8, 20)
    np.testing.assert_allclose(np.asarray(x, float), data[:, :8], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y, float), data[:, 8], rtol=1e-4)


def test_naval_nested_dir_whitespace(tmp_path):
    # Real layout: naval/UCI CBM Dataset/data.txt — 18 whitespace-separated
    # columns, no header (reference reads with header=0: first record is
    # consumed as the header, a reference quirk we preserve).
    d = tmp_path / "naval" / "UCI CBM Dataset"
    d.mkdir(parents=True)
    data, body = _rows(21, 18, 1, sep="   ")
    (d / "data.txt").write_text(body + "\n")
    x, y = _round_trip("naval", tmp_path, 16, 20)
    np.testing.assert_allclose(np.asarray(x, float), data[1:, :16], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y, float), data[1:, 16], rtol=1e-4)


def test_wine_semicolon_csv(tmp_path):
    d = tmp_path / "wine"
    d.mkdir()
    data, body = _rows(15, 12, 2, sep=";")
    header = ";".join(f'"f{i}"' for i in range(12))
    for f in ("winequality-red.csv", "winequality-white.csv"):
        (d / f).write_text(header + "\n" + body + "\n")
    for name in ("wine-red", "wine-white"):
        x, y = _round_trip(name, tmp_path, 11, 15)
        np.testing.assert_allclose(np.asarray(y, float), data[:, 11],
                                   rtol=1e-4)


def test_yacht_whitespace(tmp_path):
    d = tmp_path / "yacht"
    d.mkdir()
    data, body = _rows(21, 7, 3, sep=" ")
    (d / "yacht_hydrodynamics.data").write_text(body + "\n")
    x, y = _round_trip("yacht", tmp_path, 6, 20)   # header=0 quirk
    np.testing.assert_allclose(np.asarray(y, float), data[1:, 6], rtol=1e-4)


def test_airfoil_tab_headerless(tmp_path):
    d = tmp_path / "airfoil"
    d.mkdir()
    data, body = _rows(18, 6, 4, sep="\t")
    (d / "airfoil_self_noise.dat").write_text(body + "\n")
    x, y = _round_trip("airfoil", tmp_path, 5, 18)  # header=None: all rows
    np.testing.assert_allclose(np.asarray(x, float), data[:, :5], rtol=1e-4)


def test_sic97_prose_header_and_index(tmp_path):
    # Real sic_full.dat: 6 prose lines, then "id,x,y,rainfall" records;
    # loader uses skiprows=6, index_col=0.
    d = tmp_path / "sic97"
    d.mkdir()
    data, _ = _rows(12, 3, 5)
    lines = ["Rainfall data SIC97", "467", "2", "x", "y", "rainfall"]
    for i, row in enumerate(data):
        lines.append(f"{i + 1}," + ",".join("%.4f" % v for v in row))
    (d / "sic_full.dat").write_text("\n".join(lines) + "\n")
    x, y = _round_trip("sic97", tmp_path, 2, 12)
    np.testing.assert_allclose(np.asarray(x, float), data[:, :2], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y, float), data[:, 2], rtol=1e-4)


@pytest.mark.parametrize("name,fname,cols", [
    ("concrete", "concrete/Concrete_Data.xls", 9),
    ("energy", "energy/ENB2012_data.xlsx", 9),
    ("plant", "plant/CCPP/Folds5x2_pp.xlsx", 5),
])
def test_excel_csv_fallback(tmp_path, name, fname, cols):
    """No Excel engine ships in this image (xlrd/openpyxl absent): a local
    one-time CSV conversion placed next to the Excel original satisfies the
    loader via _read_excel_or_csv, slicing identical columns."""
    path = tmp_path / fname
    path.parent.mkdir(parents=True, exist_ok=True)
    data, body = _rows(16, cols, 6)
    header = ",".join(f"c{i}" for i in range(cols))
    csv = str(path) + ".csv"
    with open(csv, "w") as f:
        f.write(header + "\n" + body + "\n")
    nx = cols - 1
    x, y = _round_trip(name, tmp_path, nx, 16)
    np.testing.assert_allclose(np.asarray(x, float), data[:, :nx], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y, float), data[:, nx], rtol=1e-4)


def test_boston_uci_format(tmp_path):
    """UCI housing.data layout: 14 whitespace columns, one record per line
    (the local-cache path the reference got from sklearn.load_boston)."""
    d = tmp_path / "boston"
    d.mkdir()
    data, _ = _rows(10, 14, 7, sep="  ", fmt="%.4f")
    (d / "housing.data").write_text(
        "\n".join("  ".join("%.4f" % v for v in row) for row in data) + "\n")
    x, y = _round_trip("boston", tmp_path, 13, 10)
    np.testing.assert_allclose(np.asarray(x, float), data[:, :13], rtol=1e-4)


def test_classification_train_dataset_roundtrip_from_idx(tmp_path):
    """get_train_dataset end-to-end over a synthesized IDX mnist dir:
    load -> normalize -> split (the full classification data pipeline)."""
    import gzip
    import struct
    from snngp.data import classification as C

    def write_idx(path, arr):
        arr = np.asarray(arr, np.uint8)
        with gzip.open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
            f.write(struct.pack(">" + "I" * arr.ndim, *arr.shape))
            f.write(arr.tobytes())

    d = tmp_path / "mnist"
    d.mkdir()
    rng = np.random.RandomState(0)
    write_idx(str(d / "train-images-idx3-ubyte.gz"),
              rng.randint(0, 256, (40, 28, 28), np.uint8))
    write_idx(str(d / "train-labels-idx1-ubyte.gz"),
              np.arange(40, dtype=np.uint8) % 10)
    (x_tr, y_tr), (x_va, y_va), (num_class, clean_name, _) = \
        C.get_train_dataset("mnist", root=str(tmp_path), num_data=32,
                            valid_prop=0.25, seed=0)
    assert x_tr.shape[1:] == (28, 28, 1)
    assert x_tr.shape[0] + x_va.shape[0] == 32
    assert num_class == 10 and clean_name.startswith("mnist")
    assert np.isfinite(np.asarray(x_tr)).all()
