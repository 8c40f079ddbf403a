"""Real-dataset readiness, last mile (VERDICT r3 next #7).

This environment has zero egress, so no real UCI/TFDS bytes have ever
flowed end-to-end — but every raw format the loaders parse is
fixture-tested (tests/test_raw_backends.py, tests/test_data_fixtures.py).
This script closes the gap for any environment that DOES have network (or
a cached-file drop): it knows every file each loader expects, where to put
it, and where it comes from, so one invocation (or one rsync of a cache
dir) immediately yields the BASELINE.md quality goldens #1-#4.

Usage:
    python scripts/fetch_data.py                  # table: name, files, state
    python scripts/fetch_data.py fetch [name...]  # download what's missing
                                                  # (no-op offline: every
                                                  # failure is caught and
                                                  # reported, nothing raises)
    python scripts/fetch_data.py verify           # hash present files and
                                                  # check pinned digests

Reference provenance: the regression URL table mirrors
``experiments/regression/data.py:72-117`` (same upstream files, same
https->http fallback); the classification raw layouts are the on-disk
formats of the tfds datasets the reference loads
(``experiments/classification/data.py:152-158``).

Drop locations (root = ./data, the loaders' default):
    regression:      ./data/<name>/<filename>
    mnist-family:    ./data/<base>/<idx files, gunzipped>
    cifar10:         ./data/cifar10/cifar-10-batches-py/
    svhn_cropped:    ./data/svhn_cropped/{train,test}_32x32.mat
    boston:          ./data/boston/housing.data
"""

import hashlib
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snngp.data.regression import DATASET_URLS

ROOT = os.environ.get("SNNGP_DATA_ROOT", "./data")

# Classification raw files. The idx files are served gzipped; the loaders
# read them gunzipped (tests/test_raw_backends.py pins the parsers).
_MNIST_MIRROR = "https://storage.googleapis.com/cvdf-datasets/mnist/"
CLASSIFICATION = {
    "mnist": {
        "dir": "mnist",
        "files": {
            "train-images-idx3-ubyte": _MNIST_MIRROR + "train-images-idx3-ubyte.gz",
            "train-labels-idx1-ubyte": _MNIST_MIRROR + "train-labels-idx1-ubyte.gz",
            "t10k-images-idx3-ubyte": _MNIST_MIRROR + "t10k-images-idx3-ubyte.gz",
            "t10k-labels-idx1-ubyte": _MNIST_MIRROR + "t10k-labels-idx1-ubyte.gz",
        },
    },
    "cifar10": {
        "dir": "cifar10",
        "files": {
            "cifar-10-python.tar.gz":
                "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
        },
        # Official digest published alongside the tarball (cs.toronto.edu).
        "md5": {"cifar-10-python.tar.gz": "c58f30108f718f92721af3b95e74349a"},
    },
    "svhn_cropped": {
        "dir": "svhn_cropped",
        "files": {
            "train_32x32.mat":
                "http://ufldl.stanford.edu/housenumbers/train_32x32.mat",
            "test_32x32.mat":
                "http://ufldl.stanford.edu/housenumbers/test_32x32.mat",
        },
    },
    "boston": {
        "dir": "boston",
        "files": {
            "housing.data": "http://archive.ics.uci.edu/ml/"
                            "machine-learning-databases/housing/housing.data",
        },
    },
}


def _targets():
    """name -> [(relative path, url)]."""
    out = {}
    for name, files in DATASET_URLS.items():
        out[name] = [(os.path.join(name, f), u) for f, u in files.items()]
    for name, spec in CLASSIFICATION.items():
        out[name] = [(os.path.join(spec["dir"], f), u)
                     for f, u in spec["files"].items()]
    return out


def _present(rel):
    p = os.path.join(ROOT, rel)
    # Loaders accept post-processed neighbors (unzipped csv, extracted
    # batches dir) — count those as present too.
    if os.path.exists(p) or os.path.exists(p + ".csv"):
        return True
    if rel.endswith("cifar-10-python.tar.gz"):
        return os.path.isdir(os.path.join(ROOT, "cifar10",
                                          "cifar-10-batches-py"))
    return False


def _sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while blk := f.read(chunk):
            h.update(blk)
    return h.hexdigest()


def _md5(path, chunk=1 << 20):
    h = hashlib.md5()
    with open(path, "rb") as f:
        while blk := f.read(chunk):
            h.update(blk)
    return h.hexdigest()


def cmd_list():
    print(f"data root: {ROOT}\n")
    for name, targets in _targets().items():
        marks = ["ok" if _present(rel) else "MISSING" for rel, _ in targets]
        state = "ready" if all(m == "ok" for m in marks) else "missing"
        print(f"{name:14s} [{state}]")
        for (rel, url), m in zip(targets, marks):
            print(f"    {m:7s} {rel}   <- {url}")


def cmd_fetch(names):
    todo = _targets()
    if names:
        todo = {n: todo[n] for n in names}
    got, failed = 0, 0
    for name, targets in todo.items():
        for rel, url in targets:
            if _present(rel):
                continue
            dest = os.path.join(ROOT, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            fetch_url = url
            if url.split("/")[-1].endswith(".gz") and not rel.endswith(".gz"):
                dest_gz = dest + ".gz"
            else:
                dest_gz = None
            try:
                urllib.request.urlretrieve(fetch_url, dest_gz or dest)
            except Exception:
                try:  # the reference's https -> http fallback (data.py:83-94)
                    urllib.request.urlretrieve(
                        fetch_url.replace("https:", "http:", 1),
                        dest_gz or dest)
                except Exception as e:
                    print(f"  fetch failed (offline?): {rel}: "
                          f"{type(e).__name__}")
                    failed += 1
                    continue
            if dest_gz:
                import gzip
                import shutil
                with gzip.open(dest_gz, "rb") as fin, open(dest, "wb") as fout:
                    shutil.copyfileobj(fin, fout)
                os.remove(dest_gz)
            if rel.endswith((".zip", ".tar.gz")):
                _extract(os.path.join(ROOT, rel))
            print(f"  fetched {rel}")
            got += 1
    print(f"\nfetched {got}, failed {failed} "
          f"(failures leave existing files untouched; re-run when online)")


def _extract(path):
    d = os.path.dirname(path)
    if path.endswith(".zip"):
        import zipfile
        with zipfile.ZipFile(path) as z:
            z.extractall(d)
    elif path.endswith(".tar.gz"):
        import tarfile
        with tarfile.open(path) as t:
            t.extractall(d, filter="data")


def cmd_verify():
    """Print sha256 of every present file; check pinned digests."""
    bad = 0
    for name, targets in _targets().items():
        pins = CLASSIFICATION.get(name, {}).get("md5", {})
        for rel, _ in targets:
            p = os.path.join(ROOT, rel)
            if not os.path.exists(p):
                continue
            digest = _sha256(p)
            line = f"{digest}  {rel}"
            fname = os.path.basename(rel)
            if fname in pins:
                ok = _md5(p) == pins[fname]
                line += "  [md5 " + ("OK" if ok else "MISMATCH") + "]"
                bad += 0 if ok else 1
            print(line)
    if bad:
        sys.exit(f"{bad} pinned digest mismatch(es)")


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or args[0] == "list":
        cmd_list()
    elif args[0] == "fetch":
        cmd_fetch(args[1:])
    elif args[0] == "verify":
        cmd_verify()
    else:
        sys.exit(f"unknown command {args[0]!r}; use list/fetch/verify")
