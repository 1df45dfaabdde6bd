"""Own SHA-256 (ops/sha256.py) — differential vs hashlib/hmac (the oracle;
the implementation itself shares no code with either). Covers every message
length 0..300, streaming updates in odd chunk sizes, the batched device
path, and HMAC."""

import hashlib
import hmac as hmac_mod

import numpy as np
import pytest

from stringzilla_tpu.ops.sha256 import Sha256, hmac_sha256, sha256, sha256_batch


def test_sha256_all_lengths(rng):
    for n in range(0, 301):
        msg = bytes(rng.integers(0, 256, n).astype(np.uint8))
        assert sha256(msg) == hashlib.sha256(msg).digest(), n


def test_sha256_known_vectors():
    # FIPS 180-4 appendix vectors
    assert Sha256(b"abc").hexdigest() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert Sha256(b"").hexdigest() == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    two_block = b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq"
    assert Sha256(two_block).hexdigest() == (
        "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1")


def test_sha256_streaming(rng):
    msg = bytes(rng.integers(0, 256, 1000).astype(np.uint8))
    h = Sha256()
    pos, step = 0, 1
    while pos < len(msg):
        h.update(msg[pos : pos + step])
        pos += step
        step = (step * 3 + 1) % 97 + 1
    assert h.digest() == hashlib.sha256(msg).digest()
    # copy() forks the state
    h2 = Sha256(b"prefix")
    h3 = h2.copy()
    h2.update(b"-a")
    h3.update(b"-b")
    assert h2.digest() == hashlib.sha256(b"prefix-a").digest()
    assert h3.digest() == hashlib.sha256(b"prefix-b").digest()
    # digest() is idempotent (non-destructive finalization)
    assert h2.digest() == h2.digest()


def test_sha256_batch(rng):
    msgs = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8))
            for n in rng.integers(0, 400, size=257)]
    msgs += [b"", b"abc"]
    out = sha256_batch(msgs)
    assert out.shape == (len(msgs), 32)
    for i, m in enumerate(msgs):
        assert bytes(out[i]) == hashlib.sha256(m).digest(), i


def test_hmac_sha256(rng):
    for klen in (0, 1, 32, 64, 65, 200):
        key = bytes(rng.integers(0, 256, klen).astype(np.uint8))
        msg = bytes(rng.integers(0, 256, 123).astype(np.uint8))
        assert hmac_sha256(key, msg) == hmac_mod.new(
            key, msg, hashlib.sha256).digest(), klen
