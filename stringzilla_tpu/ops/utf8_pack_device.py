"""Device-side UTF-8 decode → runes, feeding the ``_utf8`` DP engines.

The reference decodes UTF-8 with register-wide lead-byte classification
(``sz_utf8_decode``, reference ``utf8_runes.h:96``, per-ISA kernels under
``utf8_runes/``). Round 2 of this framework decoded on the host
(``tapecraft.cpp``) and shipped rune tapes to the chip; this module finishes
the move on-device:

* **Count pass** — one gather of the bucket's bytes; a rune starts at every
  non-continuation byte, so the rune count is a masked row-sum. The same
  pass evaluates RFC 3629 validity per string (structure + overlong /
  surrogate / >U+10FFFF ranges, zero padding giving exact truncation
  semantics) so malformed strings can take the host's maximal-subpart
  U+FFFD path instead.
* **Decode pass** — for output slot ``j`` of each string, the lead byte
  position is the lower bound of ``j+1`` in the row-wise inclusive prefix
  sum of the lead mask (a vectorized binary search — ``log2(byte_len)``
  gathers); the rune value then assembles from up to four gathered bytes
  according to the lead's class. Everything stays one XLA program per
  (byte_len, rune_len) bucket shape.

Both passes are plain XLA (gather/cumsum shapes — no wavefronts), so they
run identically on the CPU test tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rune_count_validity", "decode_pack_device"]


def _gather_rows(blob, offs, lens, row_len):
    j = jnp.arange(row_len, dtype=jnp.int32)
    pos = offs[:, None] + j[None, :]
    valid = j[None, :] < lens[:, None]
    b = jnp.take(blob, jnp.where(valid, pos, 0).reshape(-1), axis=0)
    b = b.reshape(valid.shape).astype(jnp.int32)
    return jnp.where(valid, b, 0), valid


@functools.partial(jax.jit, static_argnames=("row_len",))
def _count_valid_jit(blob, offs, lens, *, row_len: int):
    b, valid = _gather_rows(blob, offs, lens, row_len)
    cont = (b & 0xC0) == 0x80
    l2 = (b >= 0xC2) & (b <= 0xDF)
    l3 = (b & 0xF0) == 0xE0
    l4 = (b >= 0xF0) & (b <= 0xF4)

    def back(x, d):  # x shifted right by d within each row, False-filled
        return jnp.pad(x, ((0, 0), (d, 0)))[:, :-d] if d else x

    must_cont = (back(l2, 1) | back(l3, 1) | back(l4, 1)
                 | back(l3, 2) | back(l4, 2) | back(l4, 3))
    bad_lead = (b >= 0x80) & ~(cont | l2 | l3 | l4)
    p1 = back(b, 1)
    bad_rng = cont & (((p1 == 0xE0) & (b < 0xA0)) | ((p1 == 0xED) & (b >= 0xA0))
                      | ((p1 == 0xF0) & (b < 0x90)) | ((p1 == 0xF4) & (b >= 0x90)))
    # structure checked one position past the end too (truncated trailing
    # lead): the zero padding is not a continuation. ``valid`` excludes
    # padding from lead checks; must_cont captures the spill-over.
    j = jnp.arange(row_len, dtype=jnp.int32)[None, :]
    near = j < lens[:, None] + 3
    struct_bad = (cont != must_cont) & near
    viol = ((bad_lead | bad_rng) & valid) | struct_bad
    lead = ~cont & valid
    return (jnp.sum(lead, axis=1, dtype=jnp.int32),
            jnp.sum(viol, axis=1, dtype=jnp.int32))


def rune_count_validity(dt, idx, row_len: int):
    """Per-string (rune_count, violations) for tape rows ``idx``, whose byte
    lengths are all ≤ ``row_len``. One device pass; two int32[n] pulls."""
    lanes = max(8, len(idx))
    offs, lens = dt.bucket_arrays(np.asarray(idx, dtype=np.int64), lanes)
    cnt, viol = _count_valid_jit(dt.data, offs, lens, row_len=row_len)
    return (np.asarray(cnt)[: len(idx)], np.asarray(viol)[: len(idx)])


@functools.partial(jax.jit,
                   static_argnames=("byte_len", "rune_len", "fill",
                                    "transpose", "shift"))
def _decode_pack_jit(blob, offs, blens, *, byte_len: int, rune_len: int,
                     fill: int, transpose: bool, shift: bool):
    b, valid = _gather_rows(blob, offs, blens, byte_len)
    lead = ((b & 0xC0) != 0x80) & valid
    cum = jnp.cumsum(lead.astype(jnp.int32), axis=1)  # inclusive
    total = cum[:, -1:]

    # lower_bound(cum, j+1) per row — branchless binary search, log2 steps
    target = jnp.arange(1, rune_len + 1, dtype=jnp.int32)[None, :]
    lo = jnp.zeros((b.shape[0], rune_len), jnp.int32)
    span = 1 << max(byte_len - 1, 0).bit_length()
    while span:
        mid = lo + span
        mid_c = jnp.minimum(mid, byte_len) - 1
        v = jnp.take_along_axis(cum, jnp.maximum(mid_c, 0), axis=1)
        # cum[mid-1] < target → the lower bound is at mid or beyond
        lo = jnp.where((mid <= byte_len) & (v < target), mid, lo)
        span >>= 1
    p = lo  # byte index of the lead of rune j (valid where j < total)

    def at(off):
        return jnp.take_along_axis(b, jnp.minimum(p + off, byte_len - 1),
                                   axis=1)

    b0, b1, b2, b3 = at(0), at(1), at(2), at(3)
    r2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
    r3 = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    r4 = (((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12)
          | ((b2 & 0x3F) << 6) | (b3 & 0x3F))
    rune = jnp.where(b0 < 0x80, b0,
            jnp.where(b0 < 0xE0, r2, jnp.where(b0 < 0xF0, r3, r4)))
    ok = target <= total
    out = jnp.where(ok, rune, fill)
    if shift:
        out = jnp.concatenate(
            [jnp.zeros((out.shape[0], 1), out.dtype), out], axis=1)
    return out.T if transpose else out


def decode_pack_device(dt, idx, lanes: int, byte_len: int, rune_len: int,
                       fill: int = 0, transpose: bool = True,
                       shift: bool = False):
    """Decode tape rows ``idx`` (valid UTF-8, byte length ≤ ``byte_len``)
    into a dense rune block of ``rune_len`` rows padded to ``lanes``
    strings. ``shift`` prepends the +1 zero row the column-walk DP layout
    wants. Returns a device array."""
    offs, blens = dt.bucket_arrays(np.asarray(idx, dtype=np.int64), lanes)
    return _decode_pack_jit(dt.data, offs, blens, byte_len=byte_len,
                            rune_len=rune_len, fill=fill,
                            transpose=transpose, shift=shift)
