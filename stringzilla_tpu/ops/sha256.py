"""FIPS 180-4 SHA-256 — own implementation, host streaming + device batch.

The reference implements SHA-256 per ISA tier with a streaming state struct
(``sz_sha256_state_t``: init/update/digest, reference
``include/stringzilla/hash.h:244-300``) plus SHA-NI/NEON-crypto kernels. On
TPU there is no crypto unit; the hot shape is the *batch*: thousands of
documents hashed in parallel, rounds vectorized across a lanes axis on the
VPU (the same layout as the aHash token kernel). Within one message SHA-256
is strictly sequential by construction, so the single-stream tier is an
exact numpy implementation of the compression function; throughput comes
from ``sha256_batch`` which runs one round for *all* messages per step.

The round constants are derived here from integer cube/square roots of the
first primes (exactly as FIPS 180-4 §4.2.2 defines them) rather than pasted
as literals — bit-for-bit identical, checked against hashlib in the tests.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["Sha256", "sha256", "sha256_batch", "hmac_sha256"]


def _first_primes(n: int) -> list[int]:
    out, c = [], 2
    while len(out) < n:
        if all(c % p for p in out if p * p <= c):
            out.append(c)
        c += 1
    return out


def _iroot(x: int, k: int) -> int:
    """Floor k-th root of a big integer (exact, no float rounding)."""
    r = int(round(x ** (1.0 / k)))
    while r ** k > x:
        r -= 1
    while (r + 1) ** k <= x:
        r += 1
    return r


_PRIMES = _first_primes(64)
# H0: first 32 bits of the fractional parts of sqrt(p), p in first 8 primes
_H0 = np.array([_iroot(p << 64, 2) & 0xFFFFFFFF for p in _PRIMES[:8]],
               dtype=np.uint32)
# K: first 32 bits of the fractional parts of cbrt(p), p in first 64 primes
_K = np.array([_iroot(p << 96, 3) & 0xFFFFFFFF for p in _PRIMES],
              dtype=np.uint32)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress_np(state: np.ndarray, block: bytes | np.ndarray) -> np.ndarray:
    """One 64-byte block through the compression function (numpy u32)."""
    with np.errstate(over="ignore"):
        w = np.frombuffer(bytes(block), dtype=">u4").astype(np.uint32)
        W = np.empty(64, dtype=np.uint32)
        W[:16] = w
        for t in range(16, 64):
            s0 = _rotr(W[t - 15], 7) ^ _rotr(W[t - 15], 18) ^ (W[t - 15] >> np.uint32(3))
            s1 = _rotr(W[t - 2], 17) ^ _rotr(W[t - 2], 19) ^ (W[t - 2] >> np.uint32(10))
            W[t] = W[t - 16] + s0 + W[t - 7] + s1
        a, b, c, d, e, f, g, h = state
        kw = _K + W
        for t in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + kw[t]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
        return state + np.array([a, b, c, d, e, f, g, h], dtype=np.uint32)


class Sha256:
    """Streaming SHA-256 (``sz_sha256_state_init/update/digest``, reference
    ``hash.h:283-300``) — own FIPS 180-4 implementation, no hashlib."""

    def __init__(self, data: bytes = b""):
        self._state = _H0.copy()
        self._buffer = b""
        self._length = 0  # total bytes absorbed
        if data:
            self.update(data)

    def update(self, data: bytes) -> "Sha256":
        data = bytes(data)
        self._length += len(data)
        buf = self._buffer + data
        n_full = len(buf) // 64
        for i in range(n_full):
            self._state = _compress_np(self._state, buf[i * 64 : (i + 1) * 64])
        self._buffer = buf[n_full * 64 :]
        return self

    def copy(self) -> "Sha256":
        out = Sha256()
        out._state = self._state.copy()
        out._buffer = self._buffer
        out._length = self._length
        return out

    def digest(self) -> bytes:
        state, buf = self._state, self._buffer
        pad = b"\x80" + b"\x00" * ((55 - self._length) % 64)
        tail = buf + pad + (self._length * 8).to_bytes(8, "big")
        for i in range(len(tail) // 64):
            state = _compress_np(state, tail[i * 64 : (i + 1) * 64])
        return state.astype(">u4").tobytes()

    def hexdigest(self) -> str:
        return self.digest().hex()


def sha256(data: bytes) -> bytes:
    return Sha256(data).digest()


# ---------------------------------------------------------------------------
# Batched device path — rounds vectorized across the message axis
# ---------------------------------------------------------------------------


def _jit_batch(unrolled: bool):
    """Compression over the lanes (message) axis.

    On TPU the 48 schedule-expansion and 64 round steps are fully unrolled
    (pure dataflow): the scan-based formulation shuffled a 16-word ring
    through memory every step and ran 6× slower on chip. Only the *block*
    axis stays a ``lax.scan`` so long messages don't blow up the HLO. The
    XLA **CPU** backend is the opposite — it takes minutes to compile the
    unrolled body but handles the compact scans instantly — so the
    interpreter/test tier keeps the scan formulation (``unrolled=False``).
    """
    import jax
    import jax.numpy as jnp

    def rotr(x, k):
        return (x >> np.uint32(k)) | (x << np.uint32(32 - k))

    K = [np.uint32(int(k)) for k in _K]
    k_col = jnp.asarray(_K)[:, None]  # (64, 1)

    def block_step_unrolled(st, blk):  # blk (16, G)
        W = [blk[t] for t in range(16)]
        for t in range(16, 64):
            s0 = rotr(W[t - 15], 7) ^ rotr(W[t - 15], 18) ^ (W[t - 15] >> np.uint32(3))
            s1 = rotr(W[t - 2], 17) ^ rotr(W[t - 2], 19) ^ (W[t - 2] >> np.uint32(10))
            W.append(W[t - 16] + s0 + W[t - 7] + s1)
        a, b, c, d, e, f, g, h = st
        for t in range(64):
            S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + K[t] + W[t]
            S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            a, b, c, d, e, f, g, h = t1 + S0 + maj, a, b, c, d + t1, e, f, g
        return tuple(x + y for x, y in
                     zip(st, (a, b, c, d, e, f, g, h))), None

    def block_step_scan(st, blk):  # blk (16, G)
        def expand_step(ring, _):
            w16, w15, w7, w2 = ring[0], ring[1], ring[9], ring[14]
            s0 = rotr(w15, 7) ^ rotr(w15, 18) ^ (w15 >> np.uint32(3))
            s1 = rotr(w2, 17) ^ rotr(w2, 19) ^ (w2 >> np.uint32(10))
            wt = w16 + s0 + w7 + s1
            return jnp.concatenate([ring[1:], wt[None]], axis=0), wt

        def round_step(st, kw):
            a, b, c, d, e, f, g, h = st
            S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + kw
            S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            return (t1 + S0 + maj, a, b, c, d + t1, e, f, g), None

        _, w_ext = jax.lax.scan(expand_step, blk, None, length=48)
        W = jnp.concatenate([blk, w_ext], axis=0)  # (64, G)
        out, _ = jax.lax.scan(round_step, st, k_col + W)
        return tuple(x + y for x, y in zip(st, out)), None

    def run(words):  # (n_blocks, 16, G) uint32
        nb, _, G = words.shape
        state0 = tuple(jnp.broadcast_to(jnp.uint32(int(h)), (G,))
                       for h in _H0)
        if unrolled and nb <= 8:
            # fully static block loop: wrapping the unrolled body in a scan
            # also stalls the TPU compiler, so short messages (≤512 B — the
            # token-hashing hot shape) unroll end to end
            st = state0
            for i in range(nb):
                st, _ = block_step_unrolled(st, words[i])
            return jnp.stack(st, 0)
        state, _ = jax.lax.scan(block_step_scan, state0, words)
        return jnp.stack(state, 0)  # (8, G)

    return jax.jit(run)


_BATCH_CACHE: dict[int, object] = {}


def sha256_batch(items) -> np.ndarray:
    """SHA-256 digests of a collection, shape ``(n, 32) uint8``. Messages
    are grouped by padded block count; each group's rounds run once for all
    its messages across the device's lane axis (the TPU analog of the
    reference's thread-pool batch hashing in ``szs``)."""
    from ..utils import native

    items = [bytes(s) for s in items]
    out = np.empty((len(items), 32), dtype=np.uint8)
    all_lens = np.fromiter(map(len, items), dtype=np.int64,
                           count=len(items))
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum(all_lens, out=offsets[1:])
    blob = (np.frombuffer(b"".join(items), dtype=np.uint8)
            if len(items) else np.zeros(0, np.uint8))
    blocks = (all_lens + 8) // 64 + 1
    for n_blocks in np.unique(blocks):
        idx = np.nonzero(blocks == n_blocks)[0]
        G = len(idx)
        # dyadic lane padding bounds the number of compiled (blocks, lanes)
        # specializations and keeps the lane axis VPU-aligned
        lanes = max(128, 1 << (G - 1).bit_length())
        # native ragged→dense pack, then one-shot vectorized FIPS padding:
        # the 0x80 marker and the big-endian bit-length tail
        buf = native.pack_u8(blob, offsets, idx, lanes, int(n_blocks) * 64)
        lens = np.zeros(lanes, dtype=np.int64)
        lens[:G] = all_lens[idx]
        buf[np.arange(G), lens[:G]] = 0x80
        tail = (lens[:G] * 8).astype(">u8").view(np.uint8).reshape(G, 8)
        buf[:G, -8:] = tail
        words = (buf.view(">u4").astype(np.uint32)  # (lanes, 16*n_blocks)
                 .reshape(lanes, n_blocks, 16).transpose(1, 2, 0))
        from ..utils import platform

        unrolled = platform.on_tpu()
        fn = _BATCH_CACHE.get(unrolled)
        if fn is None:
            fn = _BATCH_CACHE[unrolled] = _jit_batch(unrolled)
        digests = np.asarray(fn(words))[:, :G]  # (8, G) uint32
        out[np.asarray(idx)] = (
            np.ascontiguousarray(digests.T).astype(">u4").view(np.uint8).reshape(G, 32))
    return out


def hmac_sha256(key: bytes, message: bytes) -> bytes:
    """RFC 2104 HMAC over the own SHA-256 (reference exposes ``hmac_sha256``
    in its Python binding)."""
    key = bytes(key)
    if len(key) > 64:
        key = sha256(key)
    key = key.ljust(64, b"\x00")
    ipad = bytes(b ^ 0x36 for b in key)
    opad = bytes(b ^ 0x5C for b in key)
    return sha256(opad + sha256(ipad + bytes(message)))
