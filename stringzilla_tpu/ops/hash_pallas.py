"""Batched ``sz_hash`` on TPU — thousands of tokens per AES step.

The reference hashes one string per call with AES-NI (reference
``hash/serial.h:506-599``; throughput numbers in ``bench/token.cpp``). The
TPU path hashes a whole collection at once: tokens are bucketed by 16-byte
block count (1..4 for the ≤64 B short path — the overwhelming majority of
tokens), packed bytes-down-sublanes / tokens-across-lanes ``(16·B, lanes)``,
and every AES round advances every lane together:

* AESENC with the in-vreg lane-gather S-box; every fixed byte permutation
  (ShiftRows routing, MixColumns rotations, the sum lane's shuffle) lowers
  to sublane rolls + row selects (single-row vector slices crash Mosaic's
  layout pass);
* the sum lane's u64 addition is a byte-wise add with a 7-pass ripple
  carry, masked at u64 boundaries;
* the length-dependent final key is built lane-wise from the runtime length
  vector.

Outputs are bit-identical to ``ops.hash.sz_hash`` for every length/seed.
Strings over 64 B take the host path (rare for token workloads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import native, platform
from .aes_pallas import _SBOX_LANES, _sub_bytes as _sbox_gather
from .hash import PI, SHUFFLE, sz_hash

__all__ = ["hash_tokens_device", "hash_tokens_raw", "hash_batch_device"]

LANES_BLOCK = 1024
INT_MIN = -(1 << 31)


def _uless(a, b):
    """Unsigned a < b on int32 (sign-flip trick)."""
    return (a ^ INT_MIN) < (b ^ INT_MIN)


def _row_roll(X: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    """Circular roll within 16-row groups; out[g*16+p] = X[g*16+(p+shift)%16]
    (grouped so the long path's four stacked AES lanes roll independently)."""
    from .aes_pallas import _roll0

    return _roll0(X, -shift, interpret)


def _permute16(X: jnp.ndarray, perm, rows, interpret: bool) -> jnp.ndarray:
    """Fixed 16-row permutation out[p] = X[perm[p]] as rolls + row selects —
    single-row vector slices crash Mosaic's layout pass, rolls don't."""
    by_shift: dict[int, list[int]] = {}
    for p, s in enumerate(perm):
        by_shift.setdefault((int(s) - p) % 16, []).append(p)
    out = jnp.zeros(X.shape, X.dtype)
    for shift, ps in by_shift.items():
        rolled = _row_roll(X, shift, interpret)
        mask = jnp.zeros(X.shape, jnp.bool_)
        for p in ps:
            mask = mask | (rows == p)
        out = jnp.where(mask, rolled, out)
    return out


def _sub_bytes(x: jnp.ndarray, sbox_ref) -> jnp.ndarray:
    """AES SubBytes via the in-vreg lane gather (``aes_pallas._sub_bytes``)."""
    return _sbox_gather(x, sbox_ref[...])


_SHIFTROWS = [(5 * p) % 16 for p in range(16)]
_ROT1 = [p - (p & 3) + ((p + 1) & 3) for p in range(16)]
_ROT2 = [p - (p & 3) + ((p + 2) & 3) for p in range(16)]


def _aesenc16(state, key, sbox_ref, rows, interpret):
    """AESENC on (16, L) byte planes — same math as ``ops.hash.aesenc``.
    Delegates to ``aes_pallas.aes_round`` (roll+select ShiftRows routing,
    lane-gather SubBytes)."""
    from .aes_pallas import aes_round

    return aes_round(state, key, sbox_ref[...], interpret)


def _add_u64_bytes(A, B, rows, interpret):
    """(16, L) + (16, L) as two little-endian u64 lanes (rows 0-7, 8-15):
    byte-wise add with a Kogge-Stone carry prefix — 3 combine rounds over
    the 8-byte groups instead of a 7-pass ripple."""
    s = A + B  # 9-bit sums
    in_grp = rows & 7  # byte position within its u64

    def down(X, d):  # X[p-d], zeroed where the shift crosses a u64 head
        shifted = _row_roll(X, -d, interpret)
        return jnp.where(in_grp >= d, shifted, 0)

    g = s >> 8  # generates a carry
    p = ((s & 0xFF) == 0xFF).astype(jnp.int32)  # propagates one
    d = 1
    while d < 8:
        g = g | (p & down(g, d))
        p = p & down(p, d)
        d *= 2
    c_in = down(g, 1)  # carry INTO byte p
    return (s + c_in) & 0xFF


def _sum_update16(summ, data, rows, interpret):
    """shuffle(sum) + data (``hash/serial.h:299-302``)."""
    return _add_u64_bytes(_permute16(summ, SHUFFLE, rows, interpret),
                          data, rows, interpret)


def _kernel(n_blocks: int, interpret: bool, refs):
    data_ref, len_ref, seed_ref, sbox_ref, pi_ref, out_ref = refs
    L = len_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (16, L), 0)

    def seeded(col):
        # (16, L) byte plane of seed ^ PI pair, precomputed host-side as the
        # (16, 2) pi_ref: column 0 = aes pair, column 1 = sum pair.
        return jnp.broadcast_to(pi_ref[:, col : col + 1], (16, L)).astype(jnp.int32)

    aes = seeded(0)
    summ = seeded(1)
    for b in range(n_blocks):
        block = data_ref[b * 16 : (b + 1) * 16, :]
        aes = _aesenc16(aes, block, sbox_ref, rows, interpret)
        summ = _sum_update16(summ, block, rows, interpret)

    # key_with_length byte plane: u64 lanes (seed + len, seed), built
    # elementwise (row iota selects which 32-bit word / byte each row takes).
    seed_lo = seed_ref[0, 0]
    seed_hi = seed_ref[0, 1]
    ln = len_ref[...]  # (1, L)
    kw_lo = seed_lo + ln
    kw_carry = _uless(kw_lo, jnp.broadcast_to(seed_lo, kw_lo.shape)).astype(jnp.int32)
    kw_hi = seed_hi + kw_carry
    word = jnp.where(rows < 4, kw_lo,
            jnp.where(rows < 8, kw_hi,
             jnp.where(rows < 12, seed_lo, seed_hi)))
    kwl = (word >> ((rows & 3) << 3)) & 0xFF

    mixed = _aesenc16(summ, aes, sbox_ref, rows, interpret)
    result = _aesenc16(_aesenc16(mixed, kwl, sbox_ref, rows, interpret),
                       mixed, sbox_ref, rows, interpret)
    out_ref[...] = result


@functools.lru_cache(maxsize=32)
def _build(n_blocks: int, n_lanes: int, interpret: bool):
    grid = (n_lanes // LANES_BLOCK,)
    kernel = functools.partial(_kernel, n_blocks, interpret)

    def wrapped(data, lens, seed, sbox, pib):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((16 * n_blocks, LANES_BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, LANES_BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, n_lanes), jnp.int32),
            interpret=interpret,
        )(data, lens, seed, sbox, pib)

    return jax.jit(wrapped)


def hash_tokens_raw(data2d, lengths, seed: int, n_blocks: int):
    """Device-resident variant: jnp in (already padded to LANES_BLOCK),
    (16, n) int32 byte planes out — no host transfer, for benching/pipelines."""
    seed_arr = np.array([[seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF]],
                        dtype=np.uint32).view(np.int32)
    with np.errstate(over="ignore"):
        aes_pair = (np.uint64(seed) ^ PI[0:2]).astype("<u8").view(np.uint8)
        sum_pair = (np.uint64(seed) ^ PI[8:10]).astype("<u8").view(np.uint8)
    pib = np.stack([aes_pair, sum_pair], axis=1).astype(np.int32)
    call = _build(n_blocks, int(data2d.shape[1]), platform.pallas_interpret())
    return call(data2d, lengths.reshape(1, -1), jnp.asarray(seed_arr),
                jnp.asarray(_SBOX_LANES), jnp.asarray(pib))


def hash_tokens_device(data2d: np.ndarray, lengths: np.ndarray, seed: int,
                       n_blocks: int) -> np.ndarray:
    """Hash one bucket: ``data2d`` is ``(16*n_blocks, n) int32`` zero-padded
    token bytes (tokens across lanes), ``lengths (n,)``. Returns u64[n]."""
    n = data2d.shape[1]
    # dyadic lane total: the lane count is a kernel compile key, so a dyadic
    # ladder bounds the compiled specializations across collection sizes
    total = max(1 << max(n - 1, 1).bit_length(), LANES_BLOCK)
    total = -(-total // LANES_BLOCK) * LANES_BLOCK
    if total != n:
        pad = np.zeros((data2d.shape[0], total - n), dtype=np.int32)
        data2d = np.concatenate([data2d, pad], axis=1)
        lengths = np.concatenate([lengths, np.zeros(total - n, np.int32)])
    seed_arr = np.array([[seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF]],
                        dtype=np.uint32).view(np.int32)
    with np.errstate(over="ignore"):
        aes_pair = (np.uint64(seed) ^ PI[0:2]).astype("<u8").view(np.uint8)
        sum_pair = (np.uint64(seed) ^ PI[8:10]).astype("<u8").view(np.uint8)
    pib = np.stack([aes_pair, sum_pair], axis=1).astype(np.int32)  # (16, 2)
    call = _build(n_blocks, total, platform.pallas_interpret())
    out = np.asarray(call(jnp.asarray(data2d), jnp.asarray(lengths).reshape(1, -1),
                          jnp.asarray(seed_arr), jnp.asarray(_SBOX_LANES),
                          jnp.asarray(pib)))
    # out is (16, n) byte planes; the digest is the first 8 bytes LE
    b = out[:8, :n].astype(np.uint64)
    shifts = np.uint64(8) * np.arange(8, dtype=np.uint64)
    return np.bitwise_or.reduce(b << shifts[:, None], axis=0)


def _kernel_long(cb: int, n_steps: int, interpret: bool, refs):
    """Long path (> 64 B): 512-bit state as four stacked AES lanes (64 rows).
    The chunk axis is *streamed through the grid* — each grid step absorbs
    ``cb`` 64-byte chunks from a bounded VMEM block, carrying the state in
    VMEM scratch across steps, so the per-step footprint is constant no
    matter how long the strings are (1 MB documents stream just like 1 KB
    ones). Chunks are live-masked per lane so one kernel serves a dyadic
    chunk-count bucket. The deferred (zero-padded) final block and the
    reference's lane-collapse finalization (``hash/serial.h:443-500``) run
    in the last step."""
    (data_ref, fin_ref, len_ref, chunks_ref, seed_ref, sbox_ref, pi8_ref,
     out_ref, aes_ref, sum_ref) = refs
    j = pl.program_id(1)
    L = len_ref.shape[1]
    rows64 = jax.lax.broadcasted_iota(jnp.int32, (64, L), 0)
    rows64_16 = rows64 % 16
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, L), 0)

    @pl.when(j == 0)
    def _init():
        aes_ref[...] = jnp.broadcast_to(pi8_ref[:, 0:1], (64, L)).astype(jnp.int32)
        sum_ref[...] = jnp.broadcast_to(pi8_ref[:, 1:2], (64, L)).astype(jnp.int32)

    aes = aes_ref[...]
    summ = sum_ref[...]
    chunks = chunks_ref[...]  # (1, L) full-chunk count per lane

    for k in range(cb):
        blk = data_ref[k * 64 : (k + 1) * 64, :]
        live = j * cb + k < chunks
        aes = jnp.where(live, _aesenc16(aes, blk, sbox_ref, rows64, interpret), aes)
        summ = jnp.where(live, _sum_update16(summ, blk, rows64_16, interpret), summ)

    aes_ref[...] = aes
    sum_ref[...] = summ

    @pl.when(j == n_steps - 1)
    def _finalize():
        ins = fin_ref[...]
        lanes_aes = _aesenc16(aes, ins, sbox_ref, rows64, interpret)
        lanes_sum = _sum_update16(summ, ins, rows64_16, interpret)
        mixed = _aesenc16(lanes_sum, lanes_aes, sbox_ref, rows64, interpret)

        m01 = _aesenc16(mixed[0:16], mixed[16:32], sbox_ref, rows16, interpret)
        m23 = _aesenc16(mixed[32:48], mixed[48:64], sbox_ref, rows16, interpret)
        mall = _aesenc16(m01, m23, sbox_ref, rows16, interpret)

        # key_with_length byte plane (same as the short kernel).
        seed_lo = seed_ref[0, 0]
        seed_hi = seed_ref[0, 1]
        ln = len_ref[...]
        kw_lo = seed_lo + ln
        kw_carry = _uless(kw_lo, jnp.broadcast_to(seed_lo, kw_lo.shape)).astype(jnp.int32)
        kw_hi = seed_hi + kw_carry
        word = jnp.where(rows16 < 4, kw_lo,
                jnp.where(rows16 < 8, kw_hi,
                 jnp.where(rows16 < 12, seed_lo, seed_hi)))
        kwl = (word >> ((rows16 & 3) << 3)) & 0xFF

        out_ref[...] = _aesenc16(_aesenc16(mall, kwl, sbox_ref, rows16, interpret),
                                 mall, sbox_ref, rows16, interpret)


# Chunks absorbed per grid step on the streamed long path. 32 chunks ×
# 64 B × 4 B/byte-plane × 256 lanes = 2 MiB per input block (×2 with
# Pallas double-buffering) — comfortably inside the ~16 MiB VMEM budget.
LONG_CHUNK_BLOCK = 32


def _pick_long_lanes(cb: int) -> int:
    """Lane-block width targeting ~2 MiB per streamed input block."""
    lanes = (2 << 20) // (64 * cb * 4)
    lanes = max(128, min(1024, lanes))
    return 1 << (lanes.bit_length() - 1)


@functools.lru_cache(maxsize=32)
def _build_long(ncm: int, n_lanes: int, lanes_block: int, interpret: bool):
    cb = min(ncm, LONG_CHUNK_BLOCK)
    n_steps = -(-ncm // cb)
    grid = (n_lanes // lanes_block, n_steps)
    kernel = functools.partial(_kernel_long, cb, n_steps, interpret)

    def wrapped(data, fin, lens, chunks, seed, sbox, pi8):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((64 * cb, lanes_block), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, lanes_block), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes_block), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lanes_block), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, lanes_block), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, n_lanes), jnp.int32),
            scratch_shapes=[pltpu.VMEM((64, lanes_block), jnp.int32),
                            pltpu.VMEM((64, lanes_block), jnp.int32)],
            interpret=interpret,
        )(data, fin, lens, chunks, seed, sbox, pi8)

    return jax.jit(wrapped)


def _seed_planes(seed: int):
    seed_arr = np.array([[seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF]],
                        dtype=np.uint32).view(np.int32)
    with np.errstate(over="ignore"):
        aes8 = (np.uint64(seed) ^ PI[:8]).astype("<u8").view(np.uint8)
        sum8 = (np.uint64(seed) ^ PI[8:]).astype("<u8").view(np.uint8)
    pi8 = np.stack([aes8, sum8], axis=1).astype(np.int32)  # (64, 2)
    return seed_arr, pi8


@functools.lru_cache(maxsize=64)
def _build_long_tape(ncm: int, n_lanes: int, lanes_block: int, interpret: bool):
    """Fused device program: gather the bucket's bytes from the resident
    blob into the streamed chunk layout + the deferred final block, then the
    long kernel — no host packing."""
    from .pack_device import pack_on_device

    call = _build_long(ncm, n_lanes, lanes_block, interpret)
    cb = min(ncm, LONG_CHUNK_BLOCK)
    row_len = 64 * cb * (-(-ncm // cb))

    def run(blob, offs, lens, chunks, seed, sbox, pi8):
        data = pack_on_device(blob, offs, chunks * 64, row_len=row_len,
                              transpose=True)
        fin = pack_on_device(blob, offs + chunks * 64, lens - chunks * 64,
                             row_len=64, transpose=True)
        out = call(data, fin, lens.reshape(1, -1), chunks.reshape(1, -1),
                   seed, sbox, pi8)
        return _pack_u64_words(out)

    return jax.jit(run)


def _pack_u64_words(out):
    """Collapse the kernel's 16 byte-plane rows to the 8-byte digest on
    device — (2, L) int32 (lo/hi u32 words) — so the host pull is 8 B/token
    instead of 64 (the tunnel D2H is the end-to-end bottleneck)."""
    b = out[:8].astype(jnp.uint32) & jnp.uint32(0xFF)
    sh = jnp.array([0, 8, 16, 24], jnp.uint32)
    lo = (b[0:4] << sh[:, None]).sum(0, dtype=jnp.uint32)
    hi = (b[4:8] << sh[:, None]).sum(0, dtype=jnp.uint32)
    return jnp.stack([lo, hi]).astype(jnp.int32)


@functools.lru_cache(maxsize=64)
def _build_short_tape(n_blocks: int, n_lanes: int, interpret: bool):
    """Fused device program for ≤64 B tokens: gather + short kernel."""
    from .pack_device import pack_on_device

    call = _build(n_blocks, n_lanes, interpret)

    def run(blob, offs, lens, seed, sbox, pib):
        data = pack_on_device(blob, offs, lens, row_len=16 * n_blocks,
                              transpose=True)
        return _pack_u64_words(call(data, lens.reshape(1, -1), seed, sbox, pib))

    return jax.jit(run)


def hash_long_device(items: list[bytes], seed: int, ncm: int) -> np.ndarray:
    """Hash strings > 64 B on device, bucketed to ``ncm`` max full chunks.
    Returns u64 digests in input order (bit-identical to ``sz_hash``)."""
    from .tape import Tape

    dt = _as_device_tape(Tape.from_strings(items))
    out = np.asarray(_hash_long_bucket(dt, np.arange(len(items)), seed, ncm))
    return _u64_from_u32_pair(out, len(items))


def _as_device_tape(tape):
    from .pack_device import device_tape

    return device_tape(tape)


def _u64_from_u32_pair(out: np.ndarray, n: int) -> np.ndarray:
    """(2, L) int32 device pull → u64[n] (lo word row 0, hi word row 1)."""
    lo = out[0, :n].astype(np.uint32).astype(np.uint64)
    hi = out[1, :n].astype(np.uint32).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def _hash_long_bucket(dt, idx, seed: int, ncm: int):
    """Enqueue one long-bucket device program; returns ``(n, device_out)``
    — the caller pulls after ALL buckets are enqueued (one in-order queue,
    pulls overlap nothing but each pull is only 8 B/token)."""
    n = len(idx)
    cb = min(ncm, LONG_CHUNK_BLOCK)
    lanes_block = _pick_long_lanes(cb)
    total = max(-(-n // lanes_block), 1) * lanes_block
    offs, lens = dt.bucket_arrays(np.asarray(idx, dtype=np.int64), total)
    chunks = jnp.maximum(lens - 1, 0) // 64
    seed_arr, pi8 = _seed_planes(seed)
    call = _build_long_tape(ncm, total, lanes_block, platform.pallas_interpret())
    return call(dt.data, offs, lens, chunks, jnp.asarray(seed_arr),
                jnp.asarray(_SBOX_LANES), jnp.asarray(pi8))


def _hash_short_bucket(dt, idx, seed: int, n_blocks: int):
    n = len(idx)
    total = max(1 << max(n - 1, 1).bit_length(), LANES_BLOCK)
    total = -(-total // LANES_BLOCK) * LANES_BLOCK
    offs, lens = dt.bucket_arrays(np.asarray(idx, dtype=np.int64), total)
    seed_arr = np.array([[seed & 0xFFFFFFFF, (seed >> 32) & 0xFFFFFFFF]],
                        dtype=np.uint32).view(np.int32)
    with np.errstate(over="ignore"):
        aes_pair = (np.uint64(seed) ^ PI[0:2]).astype("<u8").view(np.uint8)
        sum_pair = (np.uint64(seed) ^ PI[8:10]).astype("<u8").view(np.uint8)
    pib = np.stack([aes_pair, sum_pair], axis=1).astype(np.int32)
    call = _build_short_tape(n_blocks, total, platform.pallas_interpret())
    return call(dt.data, offs, lens, jnp.asarray(seed_arr),
                jnp.asarray(_SBOX_LANES), jnp.asarray(pib))


# Streaming long path: strings up to 2 MiB run on device (32-chunk VMEM
# blocks with carried state — the grid streams the chunk axis, so VMEM use
# is constant in string length); bigger still falls back to host numpy.
LONG_DEVICE_MAX = 2 << 20


def hash_batch_device(items, seed: int = 0) -> np.ndarray:
    """Device-batched ``sz_hash`` over a collection (bit-identical to the
    reference, golden-vector-tested). Accepts a list of byte strings or a
    :class:`~stringzilla_tpu.ops.tape.Tape`. The blob rides to HBM once;
    gather/packing happens on device. Tokens ≤ 64 B run the short kernel
    bucketed by 16-byte block count; strings to ``LONG_DEVICE_MAX`` run the
    streamed four-lane long kernel bucketed by dyadic chunk count; anything
    bigger falls back to the host path."""
    from .tape import Tape

    tape = items if isinstance(items, Tape) else Tape.from_strings(
        [bytes(s) for s in items])
    return _hash_tape_core(_as_device_tape(tape), seed,
                           lambda i: tape[i])


def hash_bounds_device(buf, starts, ends, seed: int = 0) -> np.ndarray:
    """``sz_hash`` over (start, end) spans of one buffer — the zero-copy
    ``Strs.hashes`` path: the parent buffer mirrors to HBM once and every
    span is gathered on device."""
    from .pack_device import DeviceTape

    buf = np.asarray(buf, dtype=np.uint8)
    dt = DeviceTape.from_bounds(buf, starts, ends)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    return _hash_tape_core(dt, seed,
                           lambda i: buf[starts[i]:ends[i]].tobytes())


def _hash_tape_core(dt, seed: int, get_bytes) -> np.ndarray:
    lens = dt.lengths
    n = len(dt)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    short = lens <= 64
    nb_short = np.maximum(1, -(-lens // 16))
    long_mask = (~short) & (lens <= LONG_DEVICE_MAX)
    huge = np.nonzero((~short) & (~long_mask))[0]
    chunk_count = np.maximum(lens - 1, 0) // 64
    ncm_long = np.zeros(n, dtype=np.int64)
    nz = long_mask.nonzero()[0]
    if len(nz):
        ncm_long[nz] = 1 << np.ceil(
            np.log2(np.maximum(chunk_count[nz], 1))).astype(np.int64)
    pending = []
    for nb in np.unique(nb_short[short]):
        idx = np.nonzero(short & (nb_short == nb))[0]
        pending.append((idx, _hash_short_bucket(dt, idx, seed, int(nb))))
    for ncm in np.unique(ncm_long[long_mask]):
        idx = np.nonzero(long_mask & (ncm_long == ncm))[0]
        pending.append((idx, _hash_long_bucket(dt, idx, seed, int(ncm))))
    for idx, dev in pending:  # all buckets enqueued before the first pull
        out[idx] = _u64_from_u32_pair(np.asarray(dev), len(idx))
    for i in huge:
        out[i] = sz_hash(get_bytes(int(i)), seed)
    return out
