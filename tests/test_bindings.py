"""Foreign-language consumers of the tapecraft C ABI.

The reference ships seven language bindings over its C99 ABI
(``rust/stringzilla.rs:938-1656``, ``golang/lib.go``, ``javascript/lib.c``,
``csharp/StringZilla.cs``, ``java/.../StringZilla.java``, ``swift/``).
This repo ships binding sources for Rust, Go, JavaScript (N-API), C#
(P/Invoke), Java (FFM), Swift, and Perl under ``bindings/``; the Perl XS
one is built and its test suite executed here because Perl is the one
non-Python runtime with a working toolchain in CI (the rest are
compile-ready against the same header, see ``bindings/README.md``).
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERL_DIR = os.path.join(REPO, "bindings", "perl", "Tapecraft")


def _perl_toolchain() -> bool:
    if not shutil.which("perl"):
        return False
    probe = subprocess.run(
        ["perl", "-MExtUtils::MakeMaker", "-e", "1"], capture_output=True)
    return probe.returncode == 0


@pytest.mark.skipif(not _perl_toolchain(), reason="no perl/MakeMaker")
def test_perl_binding(tmp_path):
    from stringzilla_tpu.utils import native

    so = native._build()
    if so is None:
        pytest.skip("native tapecraft lib unavailable")

    # Stage: sources + an unversioned libtapecraft.so for -ltapecraft.
    build = tmp_path / "Tapecraft"
    shutil.copytree(PERL_DIR, build)
    libdir = tmp_path / "lib"
    libdir.mkdir()
    shutil.copy(so, libdir / "libtapecraft.so")

    env = dict(os.environ, TAPECRAFT_LIBDIR=str(libdir),
               LD_LIBRARY_PATH=str(libdir))
    for cmd in (["perl", "Makefile.PL"], ["make"], ["make", "test"]):
        proc = subprocess.run(cmd, cwd=build, env=env, capture_output=True,
                              text=True, timeout=300)
        assert proc.returncode == 0, (
            f"{' '.join(cmd)} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}")
    assert "All tests successful" in proc.stdout


def test_foreign_sources_track_header():
    """Every compile-ready binding source must reference only symbols that
    exist in tapecraft.h (their toolchains are absent from this CI image —
    no rustc/go/node/dotnet/jdk/swiftc — but symbol drift is still
    catchable), and each must bind a substantive slice of the ABI."""
    import re

    header = open(os.path.join(REPO, "stringzilla_tpu", "native",
                               "tapecraft.h")).read()
    exported = set(re.findall(r"\b(tc_\w+)\s*\(", header))
    for rel in ("bindings/rust/src/lib.rs", "bindings/go/tapecraft.go",
                "bindings/javascript/tapecraft_node.c", "bindings/csharp/Tapecraft.cs",
                "bindings/java/Tapecraft.java",
                "bindings/swift/Sources/Tapecraft/Tapecraft.swift",
                "bindings/perl/Tapecraft/Tapecraft.xs"):
        src = open(os.path.join(REPO, rel)).read()
        used = set(re.findall(r"\b(tc_\w+)\b", src))
        unknown = used - exported
        assert not unknown, f"{rel} references non-ABI symbols: {unknown}"
        assert len(used) >= 8, f"{rel} binds too little of the ABI"


def test_c_engine_client(tmp_path):
    """A compiled C program speaks the engine serving protocol end-to-end —
    the cross-language proof for the process-boundary engine ABI
    (reference analog: a C consumer of the szs_* entry points)."""
    import threading

    from stringzilla_tpu.serve import EngineServer

    src = os.path.join(REPO, "bindings", "c", "engine_client.c")
    binp = tmp_path / "engine_client"
    proc = subprocess.run(["gcc", "-O2", "-o", str(binp), src],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    sock = str(tmp_path / "engines.sock")
    server = EngineServer(sock)
    server.start_background()
    try:
        run = subprocess.run([str(binp), sock], capture_output=True,
                             text=True, timeout=300)
        assert run.returncode == 0, (run.stdout, run.stderr)
        assert run.stdout.count("PASS") == 3, run.stdout
    finally:
        server.shutdown()


def test_java_engine_client_tracks_protocol():
    """The managed-runtime serve client (bindings/java/EngineClient.java,
    pure JDK sockets — no C toolchain involved) must only speak ops the
    server implements and must follow the tape naming contract
    (<name>_offsets / <name>_data) and the 4-byte little-endian framing.
    No JDK exists in this image, so this is the drift guard; the identical
    byte protocol is executed in CI by the compiled C client."""
    import re

    serve = open(os.path.join(REPO, "stringzilla_tpu", "serve.py")).read()
    served_ops = set(re.findall(r'op (?:==|in \()\s*"([a-z_]+)"', serve))
    served_ops |= set(re.findall(r'"([a-z_]+)"(?:\s*,|\))', serve.split(
        'if op in ("levenshtein"', 1)[1][:200]))
    java = open(os.path.join(REPO, "bindings", "java",
                             "EngineClient.java")).read()
    spoken = set(re.findall(r'call\("([a-z_]+)"', java))
    assert spoken, "Java client calls no ops"
    unknown = spoken - served_ops
    assert not unknown, f"Java client speaks unserved ops: {unknown}"
    assert "_offsets" in java and "_data" in java
    assert "LITTLE_ENDIAN" in java
    # the response check string must match the server's literal JSON form
    assert '\\"ok\\": true' in java and '"ok": True' not in java


def test_perl_engine_client(tmp_path):
    """A pure-Perl (core modules only) program speaks the engine serving
    protocol end-to-end — the second LIVE language consumer after the
    compiled C client, covering the ops that one does not: rune-level
    levenshtein_utf8 (vs a Perl Wagner-Fischer oracle over characters),
    smith_waterman with a class table + affine gaps crossing the wire
    (expected scores computed here by the independent Gotoh oracle), and
    sha256 (vs core Digest::SHA — a second full implementation)."""
    if not shutil.which("perl"):
        pytest.skip("no perl")

    from stringzilla_tpu.serve import EngineServer

    from .oracles import score_affine

    queries = [b"GATTACA", b"ACGT"]
    cands = [b"GCATGCU", b"TACGTA", b"AAAA"]
    b2c = {ord(c): i for i, c in enumerate("ACGTU")}

    def sub_fn(x, y):
        cx, cy = b2c.get(x, 5), b2c.get(y, 5)
        return 3 if cx == cy else -1

    expected = [str(score_affine(q, c, sub_fn, -2, -1, local=True))
                for q in queries for c in cands]

    sock = str(tmp_path / "engines.sock")
    server = EngineServer(sock)
    server.start_background()
    try:
        run = subprocess.run(
            ["perl", os.path.join(REPO, "bindings", "perl",
                                  "engine_client.pl"), sock, *expected],
            capture_output=True, text=True, timeout=300)
        assert run.returncode == 0, (run.stdout, run.stderr)
        assert run.stdout.count("PASS") == 3, run.stdout
    finally:
        server.shutdown()
