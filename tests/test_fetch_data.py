"""HTTP round-trip for scripts/fetch_data.py against a localhost fixture
server (VERDICT r4 next #5): with this, the only untested link in the
BASELINE.md golden chain is the real upstream bytes themselves.

Covers the reference downloader semantics the script mirrors
(``experiments/regression/data.py:72-117``): plain fetch + placement,
gz-transport with gunzipped placement (the mnist idx convention), tar.gz
extraction, the https->http fallback, digest verification, and the
offline-failure no-op (failures are counted and reported, never raised).
"""

import gzip
import hashlib
import http.server
import importlib.util
import io
import os
import tarfile
import threading

import pytest


def _load_fetch_data():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                        "fetch_data.py")
    spec = importlib.util.spec_from_file_location("fetch_data_under_test",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def server(tmp_path):
    """Serve tmp_path/srv over localhost HTTP; yields (base_url, srv_dir)."""
    srv = tmp_path / "srv"
    srv.mkdir()

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(srv), **kw)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}/", srv
    finally:
        httpd.shutdown()


def test_fetch_roundtrip_place_gunzip_extract_verify(server, tmp_path,
                                                     monkeypatch, capsys):
    base, srv = server
    fd = _load_fetch_data()
    root = tmp_path / "data"
    monkeypatch.setattr(fd, "ROOT", str(root))

    # plain file (the boston housing.data convention)
    payload = b"0.1 2.3 4.5\n6.7 8.9 0.1\n"
    (srv / "housing.data").write_bytes(payload)
    # gz transport, gunzipped placement (the mnist idx convention)
    idx = b"\x00\x00\x08\x01\x00\x00\x00\x02\x07\x09"
    (srv / "labels-idx1-ubyte.gz").write_bytes(gzip.compress(idx))
    # tar.gz: placed AND extracted next to itself (the cifar10 convention)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        data = b"batch-bytes"
        info = tarfile.TarInfo("batches/data_batch_1")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    (srv / "arch.tar.gz").write_bytes(buf.getvalue())

    targets = {
        "toyreg": [(os.path.join("toyreg", "housing.data"),
                    base + "housing.data")],
        "toycls": [(os.path.join("toycls", "labels-idx1-ubyte"),
                    base + "labels-idx1-ubyte.gz"),
                   (os.path.join("toycls", "arch.tar.gz"),
                    base + "arch.tar.gz")],
    }
    monkeypatch.setattr(fd, "_targets", lambda: targets)

    fd.cmd_fetch([])
    out = capsys.readouterr().out
    assert "fetched 3, failed 0" in out

    assert (root / "toyreg" / "housing.data").read_bytes() == payload
    # gz transport arrived gunzipped, and the transport file is gone
    assert (root / "toycls" / "labels-idx1-ubyte").read_bytes() == idx
    assert not (root / "toycls" / "labels-idx1-ubyte.gz").exists()
    # tarball extracted in place
    assert (root / "toycls" / "batches" / "data_batch_1").read_bytes() \
        == b"batch-bytes"

    # re-fetch is a no-op (everything present)
    fd.cmd_fetch([])
    assert "fetched 0, failed 0" in capsys.readouterr().out

    # verify: md5 pin OK, then MISMATCH exits nonzero
    monkeypatch.setitem(
        fd.CLASSIFICATION, "toyreg",
        {"dir": "toyreg", "files": {},
         "md5": {"housing.data": hashlib.md5(payload).hexdigest()}})
    fd.cmd_verify()
    out = capsys.readouterr().out
    assert "[md5 OK]" in out
    assert hashlib.sha256(payload).hexdigest() in out
    fd.CLASSIFICATION["toyreg"]["md5"]["housing.data"] = "0" * 32
    with pytest.raises(SystemExit):
        fd.cmd_verify()


def test_fetch_https_fallback(server, tmp_path, monkeypatch, capsys):
    """An https:// URL against the http-only fixture server succeeds through
    the reference's https->http rewrite (regression/data.py:83-94)."""
    base, srv = server
    fd = _load_fetch_data()
    monkeypatch.setattr(fd, "ROOT", str(tmp_path / "data"))
    (srv / "a.txt").write_bytes(b"via-fallback")
    https_url = base.replace("http:", "https:", 1) + "a.txt"
    monkeypatch.setattr(fd, "_targets",
                        lambda: {"toy": [(os.path.join("toy", "a.txt"),
                                          https_url)]})
    fd.cmd_fetch([])
    assert "fetched 1, failed 0" in capsys.readouterr().out
    assert (tmp_path / "data" / "toy" / "a.txt").read_bytes() \
        == b"via-fallback"


def test_fetch_offline_is_a_counted_noop(tmp_path, monkeypatch, capsys):
    """Unreachable URLs are caught per-file and reported; nothing raises and
    nothing is written (the zero-egress contract)."""
    fd = _load_fetch_data()
    root = tmp_path / "data"
    monkeypatch.setattr(fd, "ROOT", str(root))
    dead = "http://127.0.0.1:9/nope"          # port 9 (discard): refused
    monkeypatch.setattr(fd, "_targets",
                        lambda: {"toy": [(os.path.join("toy", "nope"),
                                          dead)]})
    fd.cmd_fetch([])
    out = capsys.readouterr().out
    assert "fetched 0, failed 1" in out
    assert not (root / "toy" / "nope").exists()
