"""Bit-identity tests against golden vectors generated from the reference's
own serial build (see tests/golden/hash_vectors.json)."""

import json
import os

import numpy as np
import pytest

from stringzilla_tpu.ops import hash as szhash

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hash_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(GOLDEN) as f:
        return json.load(f)


def test_hash_golden(vectors):
    data = bytes(vectors["input"])
    for length, seed, expected in vectors["hash"]:
        got = szhash.sz_hash(data[:length], int(seed))
        assert got == int(expected), f"len={length} seed={seed}"


def test_bytesum_golden(vectors):
    data = bytes(vectors["input"])
    for length, expected in vectors["bytesum"]:
        assert szhash.bytesum(data[:length]) == int(expected)
    assert szhash.bytesum(b"hi") == 209  # documented vector, hash.h:98-103


def test_sha256_golden(vectors):
    data = bytes(vectors["input"])
    for length, expected in vectors["sha256"]:
        assert list(szhash.Sha256(data[:length]).digest()) == expected


def test_fill_random_golden(vectors):
    for length, nonce, expected in vectors["fill_random"]:
        got = szhash.fill_random(length, int(nonce))
        assert list(got) == expected, f"len={length} nonce={nonce}"


def test_streaming_hash_golden(vectors):
    data = bytes(vectors["input"])
    for splits, expected in vectors["hash_streaming"]:
        h = szhash.Hasher(42)
        off = 0
        for s in splits:
            h.update(data[off : off + s])
            off += s
        assert h.digest() == int(expected), f"splits={splits}"


def test_streaming_matches_oneshot(rng):
    data = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    for total in [0, 1, 16, 17, 64, 65, 100, 128, 200, 500]:
        want = szhash.sz_hash(data[:total], 7)
        h = szhash.Hasher(7)
        # update in awkward chunk sizes
        off = 0
        for c in [3, 13, 64, 1, 100, 400]:
            take = min(c, total - off)
            if take <= 0:
                break
            h.update(data[off : off + take])
            off += take
        if off == total:
            assert h.digest() == want, f"total={total}"


def test_multiseed_matches_singleseed():
    data = b"the quick brown fox"
    seeds = [0, 1, 42, 2**64 - 1]
    got = szhash.hash_multiseed(data, seeds)
    for s, g in zip(seeds, got):
        assert int(g) == szhash.sz_hash(data, s)


def test_hmac_roundtrip():
    import hmac, hashlib

    assert szhash.hmac_sha256(b"key", b"msg") == hmac.new(b"key", b"msg", hashlib.sha256).digest()


def test_hasher_reset_copy():
    """Hasher.reset/copy mirror the reference's streaming-state controls
    (python/stringzilla.c:7340, 7513)."""
    h = szhash.Hasher(5).update(b"hello world")
    fork = h.copy().update(b"!")
    assert h.digest() == szhash.Hasher(5).update(b"hello world").digest()
    assert fork.digest() == szhash.Hasher(5).update(b"hello world!").digest()
    assert h.reset().update(b"x").digest() == szhash.Hasher(5).update(b"x").digest()
    s = szhash.Sha256(b"abc")
    d = s.digest()
    assert s.reset().update(b"abc").digest() == d
