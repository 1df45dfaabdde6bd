"""Out-of-process engine serving (``stringzilla_tpu/serve.py``) — the
process-boundary analog of the reference's ``szs_*`` engine C ABI
(``stringzillas.h:104-597``): every result must equal the in-process
engine's, and errors must cross the wire without killing the worker."""

import hashlib

import numpy as np
import pytest

import stringzilla_tpu as sz
from stringzilla_tpu.serve import EngineClient, EngineServer


@pytest.fixture(scope="module")
def client(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sock") / "engines.sock")
    server = EngineServer(path)
    server.start_background()
    c = EngineClient(path)
    yield c
    c.close()
    server.shutdown()


def test_serve_levenshtein(client):
    qs = [b"kitten", b"flaw", b""]
    cs = [b"sitting", b"lawn", b"kitten", b"x"]
    (out,) = client.call("levenshtein", tapes={"queries": qs, "candidates": cs})
    np.testing.assert_array_equal(out, np.asarray(sz.LevenshteinDistances()(qs, cs)))


def test_serve_nw_classes(client):
    rng = np.random.default_rng(5)
    b2c = (np.arange(256) % 20).astype(np.uint8)
    table = rng.integers(-4, 6, (32, 32)).astype(np.int32)
    qs = [b"ACCGT", b"GATTACA"]
    cs = [b"ACGT", b"GATACA", b"TTT"]
    (out,) = client.call(
        "needleman_wunsch", open=-3, extend=-3,
        tapes={"queries": qs, "candidates": cs},
        arrays={"byte_to_class": b2c, "costs": table})
    eng = sz.NeedlemanWunschScores(byte_to_class=b2c,
                                   class_substitution_costs=table,
                                   open=-3, extend=-3)
    np.testing.assert_array_equal(out, np.asarray(eng(qs, cs)))


def test_serve_levenshtein_utf8(client):
    qs = ["héllo".encode(), b"plain"]
    cs = [b"hello", "hèllo".encode()]
    (out,) = client.call("levenshtein_utf8",
                         tapes={"queries": qs, "candidates": cs})
    np.testing.assert_array_equal(
        out, np.asarray(sz.LevenshteinDistancesUTF8()(qs, cs)))


def test_serve_smith_waterman(client):
    rng = np.random.default_rng(9)
    b2c = (np.arange(256) % 20).astype(np.uint8)
    table = rng.integers(-3, 6, (32, 32)).astype(np.int32)
    qs = [b"GATTACA"]
    cs = [b"TACO", b"GATTA"]
    (out,) = client.call(
        "smith_waterman", open=-2, extend=-2,
        tapes={"queries": qs, "candidates": cs},
        arrays={"byte_to_class": b2c, "costs": table})
    eng = sz.SmithWatermanScores(byte_to_class=b2c,
                                 class_substitution_costs=table,
                                 open=-2, extend=-2)
    np.testing.assert_array_equal(out, np.asarray(eng(qs, cs)))


def test_serve_fingerprints(client):
    docs = [b"the quick brown fox jumps over the lazy dog" * 3,
            b"pack my box with five dozen liquor jugs" * 2]
    h, c = client.call("fingerprints", ndim=128, tapes={"texts": docs})
    eh, ec = sz.Fingerprints(ndim=128)(docs)
    np.testing.assert_array_equal(h, eh)
    np.testing.assert_array_equal(c, ec)


def test_serve_hash_sha256(client):
    texts = [b"", b"a", b"hello world", b"x" * 1000]
    (hashes,) = client.call("hash", seed=7, tapes={"texts": texts})
    assert list(hashes) == [sz.hash(t, seed=7) for t in texts]
    (digests,) = client.call("sha256", tapes={"texts": texts})
    for d, t in zip(digests, texts):
        assert bytes(d) == hashlib.sha256(t).digest()


def test_serve_error_then_recover(client):
    with pytest.raises(RuntimeError, match="unknown op"):
        client.call("no_such_op", tapes={"texts": [b"x"]})
    # The worker must survive a failed request and keep serving.
    (hashes,) = client.call("hash", tapes={"texts": [b"y"]})
    assert hashes[0] == sz.hash(b"y")


def test_serve_fuzz_random_tapes(client, rng, iterations):
    """Randomized tapes (including empty strings and empty collections) through
    the wire must match the in-process engines exactly."""
    for _ in range(iterations(10)):
        nq = int(rng.integers(1, 6))
        nc = int(rng.integers(1, 12))
        qs = [bytes(rng.integers(97, 103, int(rng.integers(0, 40))).astype(np.uint8))
              for _ in range(nq)]
        cs = [bytes(rng.integers(97, 103, int(rng.integers(0, 40))).astype(np.uint8))
              for _ in range(nc)]
        (out,) = client.call("levenshtein", tapes={"queries": qs, "candidates": cs})
        np.testing.assert_array_equal(
            out, np.asarray(sz.LevenshteinDistances()(qs, cs)))


def test_serve_engine_cache_bounded():
    """The NW/SW engine cache keys on full table bytes; an adversarial
    client cycling tables must not grow the worker without bound."""
    srv = EngineServer("/tmp/unused.sock")
    for i in range(srv.MAX_CACHED_ENGINES + 10):
        srv._engine(("k", i), lambda: object())
    assert len(srv._engines) == srv.MAX_CACHED_ENGINES
    # LRU: the most recently touched key survives eviction pressure
    srv._engine(("k", srv.MAX_CACHED_ENGINES + 9), lambda: object())
    keep = srv._engines[("k", srv.MAX_CACHED_ENGINES + 9)]
    for i in range(srv.MAX_CACHED_ENGINES - 1):
        srv._engine(("fresh", i), lambda: object())
    assert srv._engines[("k", srv.MAX_CACHED_ENGINES + 9)] is keep
