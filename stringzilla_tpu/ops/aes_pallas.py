"""AES round primitives + ``fill_random`` on TPU — gather-free, lane-parallel.

The reference's hash family and PRNG are built on single AESENC rounds
(reference ``include/stringzilla/hash/serial.h:82-103`` implements the round
in scalar C; x86/Arm tiers use AESENC/AESE instructions). TPUs have no AES
hardware and no fast gathers, so the round is re-expressed as dense vector
ops on an ``(16, lanes)`` int32 layout — byte ``b`` of block ``l`` at
``[b, l]``, thousands of blocks advancing per op:

* **SubBytes**: the 256-entry S-box packed into 64 u32 words; a 64-step
  compare+select ladder picks the word, shift+mask extracts the byte — the
  same no-gather trick as ``memory_pallas.lookup_transform``;
* **ShiftRows∘SubBytes routing** (output ``p`` takes input ``5p mod 16``):
  the offset ``4p mod 16`` only takes values {0,4,8,12} by ``p mod 4`` — four
  sublane rolls + one select;
* **MixColumns**: rotate-within-4 via one roll + boundary fix, GF(2^8)
  doubling as shift/xor/mask.

``fill_random_device`` reproduces ``sz_fill_random`` (``hash/serial.h:953``)
bit-exactly: block ``l`` is ``AESENC(nonce+l ‖ nonce+l, nonce ^ PI[2(l%4)])``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform
from .hash import PI, SBOX

__all__ = ["aes_round", "fill_random_device"]

# S-box as two 128-entry lane planes for the in-vreg lane gather.
_SBOX_LANES = SBOX.reshape(2, 128).astype(np.int32)


def _sub_bytes(x: jnp.ndarray, sbox_lanes: jnp.ndarray) -> jnp.ndarray:
    """S-box substitution on int32 byte values via Mosaic's in-register lane
    gather (the TPU analog of AVX-512 VPERMB): two 128-entry shuffles + one
    select. ``sbox_lanes`` is the (2, 128) plane table. The gather requires
    the minor axis to be exactly 128 lanes, so wider arrays are viewed as
    (rows*L/128, 128) for the substitution (a cheap lane-split relayout)."""
    rows, L = x.shape
    x2 = x if L == 128 else x.reshape(rows * L // 128, 128)
    lo = jnp.broadcast_to(sbox_lanes[0:1, :], x2.shape)
    hi = jnp.broadcast_to(sbox_lanes[1:2, :], x2.shape)
    i7 = x2 & 127
    a = jnp.take_along_axis(lo, i7, axis=1)
    b = jnp.take_along_axis(hi, i7, axis=1)
    y = jnp.where(x2 < 128, a, b)
    return y if L == 128 else y.reshape(rows, L)


def _roll_full(x: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    if shift % x.shape[0] == 0:
        return x
    if interpret:
        return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _roll0(x: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    """Circular roll within each 16-row group along axis 0. For a single
    group it is one hardware roll; for stacked groups (e.g. the long-path
    hash's four AES lanes as 64 rows) it is two full rolls + one select."""
    n = x.shape[0]
    s = shift % 16
    if s == 0:
        return x
    if n == 16:
        return _roll_full(x, shift, interpret)
    # out[g*16+b] = x[g*16 + (b - s) % 16]
    r1 = _roll_full(x, s, interpret)       # right for b >= s
    r2 = _roll_full(x, s - 16, interpret)  # right for b < s
    b = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % 16
    return jnp.where(b >= s, r1, r2)


def aes_round(state: jnp.ndarray, key: jnp.ndarray, sbox_lanes: jnp.ndarray,
              interpret: bool) -> jnp.ndarray:
    """One AESENC round on ``(16, lanes)`` int32 byte planes (values 0..255):
    SubBytes ∘ ShiftRows ∘ MixColumns ⊕ key, bit-identical to
    ``ops.hash.aesenc``."""
    rows = jax.lax.broadcasted_iota(jnp.int32, state.shape, 0)

    sub = _sub_bytes(state, sbox_lanes)

    # shifted[p] = sub[(5p) % 16] = roll down by (4p % 16) ∈ {0,4,8,12}
    r4 = _roll0(sub, -4, interpret)
    r8 = _roll0(sub, -8, interpret)
    r12 = _roll0(sub, -12, interpret)
    pm4 = rows & 3
    shifted = jnp.where(pm4 == 0, sub,
               jnp.where(pm4 == 1, r4,
                jnp.where(pm4 == 2, r8, r12)))

    # MixColumns on 4-byte groups along axis 0.
    # rot[p] = shifted[p+1 within group]: roll -1 then fix group tails.
    up1 = _roll0(shifted, -1, interpret)
    up3back = _roll0(shifted, 3, interpret)  # p -> p-3 (group tail wraps)
    rot = jnp.where(pm4 == 3, up3back, up1)
    # xor of all 4 bytes in the group, broadcast back to each position
    g2 = shifted ^ rot
    x2 = _roll0(g2, -2, interpret)
    x2rot = jnp.where(pm4 >= 2, _roll0(g2, 2, interpret), x2)
    xor_all = g2 ^ x2rot  # shifted^rot at p and p+2 (mod group) = all 4 bytes
    dbl = ((g2 << 1) ^ (((g2 >> 7) & 1) * 0x1B)) & 0xFF
    mixed = shifted ^ xor_all ^ dbl
    return mixed ^ key


def _fill_kernel(interpret: bool, refs):
    nonce_ref, sbox_ref, pi_ref, out_ref = refs
    i = pl.program_id(0)
    rows16, lanes = out_ref.shape

    # block index per lane (global)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows16, lanes), 1) + i * lanes
    nonce_lo = nonce_ref[0, 0]
    nonce_hi = nonce_ref[0, 1]
    # ctr = nonce + lane (u64 add with carry, int32 pieces)
    ctr_lo = nonce_lo + lane
    carry = ((ctr_lo ^ jnp.int32(-2**31)) < (nonce_lo ^ jnp.int32(-2**31))).astype(jnp.int32)
    ctr_hi = nonce_hi + carry
    # input byte plane: rows 0-7 = ctr bytes LE, rows 8-15 repeat
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows16, lanes), 0)
    b = rows & 7
    word = jnp.where(b < 4, ctr_lo, ctr_hi)
    inp = (word >> ((b & 3) << 3)) & 0xFF

    # key byte plane: (nonce ^ PI[2*(l%4) + w]) — pi_ref is (16, 4) byte
    # planes per l%4 variant of PI, already XORed structure built host-side?
    # pi_ref[b, v] = byte b of PI pair v; key = pi_byte ^ nonce_byte
    lm4 = lane & 3
    pib = jnp.zeros((rows16, lanes), jnp.int32)
    for v in range(4):
        col = pi_ref[:, v : v + 1]  # (16, 1)
        pib = jnp.where(lm4 == v, col, pib)
    nword = jnp.where(rows < 8, jnp.where((rows & 7) < 4, nonce_lo, nonce_hi),
                      jnp.where((rows & 7) < 4, nonce_lo, nonce_hi))
    nbyte = (nword >> ((rows & 3) << 3)) & 0xFF
    key = pib ^ nbyte

    state = inp
    rows_i = rows
    sub = _sub_bytes(state, sbox_ref[...])
    r4 = _roll0(sub, -4, interpret)
    r8 = _roll0(sub, -8, interpret)
    r12 = _roll0(sub, -12, interpret)
    pm4 = rows_i & 3
    shifted = jnp.where(pm4 == 0, sub,
               jnp.where(pm4 == 1, r4,
                jnp.where(pm4 == 2, r8, r12)))
    up1 = _roll0(shifted, -1, interpret)
    up3back = _roll0(shifted, 3, interpret)
    rot = jnp.where(pm4 == 3, up3back, up1)
    g2 = shifted ^ rot
    x2 = _roll0(g2, -2, interpret)
    x2b = _roll0(g2, 2, interpret)
    xor_all = g2 ^ jnp.where(pm4 >= 2, x2b, x2)
    dbl = ((g2 << 1) ^ (((g2 >> 7) & 1) * 0x1B)) & 0xFF
    out_ref[...] = ((shifted ^ xor_all ^ dbl) ^ key).astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _build_fill(n_lanes_total: int, lane_block: int, interpret: bool):
    grid = (n_lanes_total // lane_block,)

    def wrapped(nonce, sbox, pib):
        return pl.pallas_call(
            lambda *refs: functools.partial(_fill_kernel, interpret)(refs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, lane_block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, n_lanes_total), jnp.int32),
            interpret=interpret,
        )(nonce, sbox, pib)

    return jax.jit(wrapped)


def fill_random_device(length: int, nonce: int = 0) -> jnp.ndarray:
    """Device-resident ``sz_fill_random``: returns ``uint8[length]`` on the
    accelerator, bit-identical to the host path."""
    if length <= 0:
        return jnp.zeros(0, jnp.uint8)
    n_blocks = -(-length // 16)
    lane_block = 1024
    total = max(-(-n_blocks // lane_block), 1) * lane_block
    nonce_arr = np.array([[nonce & 0xFFFFFFFF, (nonce >> 32) & 0xFFFFFFFF]],
                         dtype=np.uint32).view(np.int32)
    sbox = _SBOX_LANES
    # PI byte planes: pib[b, v] = byte b of (PI[2v], PI[2v+1]) pair
    pi_bytes = PI[:8].astype("<u8").view(np.uint8).reshape(4, 16)
    pib = np.ascontiguousarray(pi_bytes.T).astype(np.int32)  # (16, 4)
    call = _build_fill(total, lane_block, platform.pallas_interpret())
    out = call(jnp.asarray(nonce_arr), jnp.asarray(sbox), jnp.asarray(pib))
    # (16, total) byte planes → linear bytes: position = lane*16 + row
    linear = out.T.reshape(-1).astype(jnp.uint8)
    return linear[:length]
