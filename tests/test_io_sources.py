"""S1 source dispatch: parquet path equivalence + the environment-gated
iceberg branch (no Iceberg runtime jar ships in this sandbox, so the
contract under test is the actionable error, not a fake metadata parser)."""

import pyarrow.parquet as pq
import pytest

from tokenlake.io_sources import read_sequences
from tokenlake.schema import generate_sequences


def test_parquet_path_equivalent(spark, tmp_path):
    p = str(tmp_path / "seq")
    import os

    os.makedirs(p)
    pq.write_table(generate_sequences(scale=0.005), f"{p}/s.parquet")
    a = read_sequences(spark, p).orderBy("doc_id").collect()
    b = spark.read.parquet(p).orderBy("doc_id").collect()
    assert a == b and len(a) > 0


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown source format"):
        read_sequences(spark, "/x", format="orc")


def test_snapshot_requires_iceberg(spark):
    with pytest.raises(ValueError, match="iceberg-format feature"):
        read_sequences(spark, "/x", snapshot_id=7)


def test_iceberg_gated_error_names_the_fix(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_sequences(spark, "db.sequences", format="iceberg")


# --- S7: fetch_if_missing (download.rs:8-38 analog, file:// testable) ---


def test_fetch_streams_and_creates_parents(tmp_path):
    from tokenlake.io_sources import fetch_if_missing

    src = tmp_path / "remote" / "part-0.parquet"
    src.parent.mkdir()
    src.write_bytes(b"\x00\x01" * 70000)  # > one 1 MiB copy chunk? no — force small chunks
    dest = tmp_path / "deep" / "nested" / "local.parquet"
    assert fetch_if_missing(src.as_uri(), str(dest), chunk_bytes=4096) is True
    assert dest.read_bytes() == src.read_bytes()
    # atomic rename leaves no .part residue on success
    assert not list(dest.parent.glob(dest.name + ".part*"))


def test_fetch_skips_existing_without_touching(tmp_path):
    from tokenlake.io_sources import fetch_if_missing

    src = tmp_path / "a.bin"
    src.write_bytes(b"new content")
    dest = tmp_path / "dest.bin"
    dest.write_bytes(b"old content")
    assert fetch_if_missing(src.as_uri(), str(dest)) is False
    assert dest.read_bytes() == b"old content"  # skip must not overwrite


def test_fetch_rejects_unknown_scheme(tmp_path):
    from tokenlake.io_sources import fetch_if_missing

    with pytest.raises(ValueError, match="unsupported URL scheme"):
        fetch_if_missing("s3://bucket/key", str(tmp_path / "x"))


def test_fetch_failure_leaves_no_destination(tmp_path):
    """A fetch that dies mid-stream must not leave a file the skip-if-exists
    check would treat as complete (the hardening over the reference, which
    writes the destination directly)."""
    from tokenlake.io_sources import fetch_if_missing

    dest = tmp_path / "never.bin"
    with pytest.raises(OSError):
        fetch_if_missing((tmp_path / "missing.bin").as_uri(), str(dest))
    assert not dest.exists()


def test_fetch_midstream_failure_leaves_no_part_orphan(tmp_path, monkeypatch):
    """A stream that dies AFTER the temp file is created must unlink it —
    otherwise every retry leaks another .part.<pid>.<tid> next to the data."""
    import urllib.request

    from tokenlake.io_sources import fetch_if_missing

    class DyingReader:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n=-1):
            raise OSError("connection reset mid-stream")

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda url, timeout=None: DyingReader()
    )
    dest = tmp_path / "obj.bin"
    with pytest.raises(OSError, match="mid-stream"):
        fetch_if_missing("file:///irrelevant", str(dest))
    assert not dest.exists()
    assert not list(tmp_path.glob("obj.bin.part*"))


def test_fetch_cli_fails_fast_but_resumably(tmp_path, capsys):
    """A dead URL mid-manifest: clean error + summary JSON (exit 1), earlier
    files kept, and a rerun with the source repaired resumes past them."""
    from tokenlake.cli import main

    good0 = tmp_path / "g0.bin"
    good0.write_bytes(b"a" * 10)
    good2 = tmp_path / "g2.bin"
    good2.write_bytes(b"c" * 10)
    missing = tmp_path / "gone.bin"  # not created yet
    dests = [tmp_path / "out" / f"f{i}.bin" for i in range(3)]
    man = tmp_path / "man.txt"
    man.write_text(
        f"{good0.as_uri()} {dests[0]}\n{missing.as_uri()} {dests[1]}\n"
        f"{good2.as_uri()} {dests[2]}\n"
    )
    assert main(["fetch", "--manifest", str(man)]) == 1
    out = capsys.readouterr()
    assert '"failed_at": 1' in out.out and "gone.bin" in out.err
    assert dests[0].exists() and not dests[1].exists() and not dests[2].exists()

    missing.write_bytes(b"b" * 10)  # repair the source; rerun resumes
    assert main(["fetch", "--manifest", str(man)]) == 0
    out2 = capsys.readouterr().out
    assert '"fetched": 2' in out2 and '"skipped": 1' in out2


def test_fetch_cli_manifest_resumes(tmp_path, capsys):
    from tokenlake.cli import main

    srcs = []
    for i in range(3):
        s = tmp_path / f"src{i}.bin"
        s.write_bytes(bytes([i]) * 100)
        srcs.append(s)
    dests = [tmp_path / "out" / f"f{i}.bin" for i in range(3)]
    man = tmp_path / "manifest.txt"
    man.write_text("".join(f"{s.as_uri()} {d}\n" for s, d in zip(srcs, dests)))

    assert main(["fetch", "--manifest", str(man)]) == 0
    out1 = capsys.readouterr().out
    assert '"fetched": 3' in out1
    # second run: everything already present -> all skipped, bytes untouched
    assert main(["fetch", "--manifest", str(man)]) == 0
    out2 = capsys.readouterr().out
    assert '"skipped": 3' in out2
    for i, d in enumerate(dests):
        assert d.read_bytes() == bytes([i]) * 100


# --- S7 live http(s) branch: loopback server, no external data ---


def _loopback_server(handler_cls):
    """Start an HTTP server on 127.0.0.1:<ephemeral>; returns (server, port).
    Caller must .shutdown() + .server_close()."""
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_fetch_http_loopback_roundtrip_and_skip(tmp_path):
    """The real urllib http branch (streaming copy, atomic rename,
    skip-if-exists) against a loopback http.server — no external data."""
    import http.server

    from tokenlake.io_sources import fetch_if_missing

    body = bytes(range(256)) * 1024  # 256 KiB, multiple copy chunks at 4 KiB

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv, port = _loopback_server(Handler)
    try:
        dest = tmp_path / "fetched" / "obj.bin"
        url = f"http://127.0.0.1:{port}/obj.bin"
        assert fetch_if_missing(url, str(dest), chunk_bytes=4096) is True
        assert dest.read_bytes() == body
        assert not list(dest.parent.glob(dest.name + ".part*"))
        # idempotence over the SAME http branch: second call skips
        assert fetch_if_missing(url, str(dest)) is False
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetch_http_midbody_drop_is_atomic_and_cli_resumable(tmp_path, capsys):
    """A server that advertises more bytes than it sends (connection drop
    mid-body): the fetch must raise, leave NO destination and NO .part
    orphan (the atomic-rename contract), and the CLI manifest loop must
    treat it as a resumable failure (exit 1 + summary), not a crash —
    IncompleteRead is an HTTPException, not an OSError."""
    import http.server

    import pytest

    from tokenlake.cli import main
    from tokenlake.io_sources import fetch_if_missing

    class TruncatingHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", "100000")
            self.end_headers()
            self.wfile.write(b"x" * 100)
            self.wfile.flush()
            # drop the socket mid-body: client sees IncompleteRead
            self.connection.close()

        def log_message(self, *a):
            pass

    srv, port = _loopback_server(TruncatingHandler)
    try:
        dest = tmp_path / "truncated.bin"
        url = f"http://127.0.0.1:{port}/t.bin"
        with pytest.raises(Exception):
            fetch_if_missing(url, str(dest), chunk_bytes=4096)
        assert not dest.exists()
        assert not list(tmp_path.glob("truncated.bin.part*"))

        # CLI: good file first, truncating URL second -> resumable exit 1
        good = tmp_path / "good.bin"
        good.write_bytes(b"ok" * 50)
        dests = [tmp_path / "out" / "f0.bin", tmp_path / "out" / "f1.bin"]
        man = tmp_path / "man.txt"
        man.write_text(f"{good.as_uri()} {dests[0]}\n{url} {dests[1]}\n")
        assert main(["fetch", "--manifest", str(man)]) == 1
        out = capsys.readouterr()
        assert '"failed_at": 1' in out.out
        assert dests[0].exists() and not dests[1].exists()
    finally:
        srv.shutdown()
        srv.server_close()
