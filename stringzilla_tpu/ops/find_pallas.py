"""Streaming Pallas search kernels — substring / byteset find over huge buffers.

The XLA-fused path materializes k shifted copies of the haystack, which breaks
past ~100 MB. This kernel streams the haystack HBM→VMEM block-by-block (the
TPU grid is sequential, so Mosaic double-buffers the DMA automatically) and
keeps everything else in VMEM/SMEM:

* haystack viewed as ``(rows, 128)`` u8, one lane per byte;
* a match needs bytes that spill into the next block → the same array is
  passed twice, once as the main ``(R, 128)`` block and once as an ``(H, 128)``
  halo block starting where the main block ends;
* per compared needle byte ``a = ar*128 + ac``: one lane-roll by ``ac`` + two
  static row slices select ``hay[p + a]`` for every position of the block at
  once — the dense analog of the reference's anomaly-offset SIMD compare
  (reference ``find/serial.h:35``, per-ISA tiers ``find/skylake.h`` etc.);
* needles ≤ 16 B are compared in full (exact in one pass). Longer needles are
  *filtered* on ≤ 16 anomaly bytes (first/mid/last 4-byte words + extras) and
  the rare surviving candidates verified exactly by the caller
  (``find_long``) — a two-stage scheme that stays exact for adversarial
  inputs while never loading more than the block into VMEM;
* bytesets are a 256-bit bitset evaluated with 8 word-selects + a bit test
  (``sz_find_byteset``, reference ``find.h:272``), no gathers;
* the per-block first/last match index is min/max-reduced into an SMEM
  accumulator carried across the sequential grid; once a forward search has a
  hit, later blocks skip all compute (``@pl.when``) — the TPU analog of early
  exit, leaving only the residual DMA stream. ``count`` sums popcounts.

Positions are int32 (buffers < 2 GiB); -1 means not found.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform

__all__ = ["search_positions", "find_long", "BLOCK_ROWS", "HALO_ROWS", "MAX_OFFSETS"]

LANES = 128
BLOCK_ROWS = 1024  # 128 KiB of haystack per grid step (tuned on v5e)
HALO_ROWS = 32  # 4 KiB halo (u8 min tile is 32 sublanes); bounds compare offsets
BIG = 2**31 - 1  # not-found sentinel for "first"
MAX_OFFSETS = 16  # unrolled compares per kernel — VMEM-stack bound
MAX_OFFSET_REACH = HALO_ROWS * LANES - 1  # max byte offset a compare may touch


def _shifted(Y: jnp.ndarray, a: int, interpret: bool) -> jnp.ndarray:
    """``out[r, c] = Y[flat_index + a]`` over the row-major byte stream of Y,
    for the first ``rows(Y) - a//128 - 1`` rows. Static ``a``."""
    ar, ac = divmod(a, LANES)
    rows = Y.shape[0] - ar - 1
    if ac == 0:
        return Y[ar : ar + rows]
    # Z[c] = Y[c + ac]; pltpu.roll wants a non-negative shift.
    Z = jnp.roll(Y, -ac, axis=1) if interpret else pltpu.roll(Y, LANES - ac, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(col < LANES - ac, Z[ar : ar + rows], Z[ar + 1 : ar + 1 + rows])


def _match_mask_block(Y, needle_ref, offsets: tuple, rows: int, interpret: bool):
    """AND of compares at the static ``offsets`` → (rows, 128) bool."""
    mask = None
    for slot, a in enumerate(offsets):
        eq = _shifted(Y, a, interpret)[:rows] == needle_ref[0, slot]
        mask = eq if mask is None else (mask & eq)
    return mask


def _byteset_mask_block(Y, words_ref, rows: int):
    """256-bit bitset probe: 8 word-selects + bit test, no gathers."""
    h = Y[:rows]
    word = jnp.zeros(h.shape, jnp.int32)
    for w in range(8):
        word = jnp.where((h >> 5) == w, words_ref[0, w], word)
    return ((word >> (h & 31)) & 1).astype(jnp.bool_)


def _kernel(mode: str, kind: str, offsets: tuple, interpret: bool, refs):
    """mode ∈ {first, last, count}; kind ∈ {needle, byteset}."""
    main_ref, halo_ref, param_ref, bounds_ref, out_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.int32(-1) if mode == "last" else (
            jnp.int32(0) if mode == "count" else jnp.int32(BIG)
        )

    acc = out_ref[0, 0]
    # Forward search: once found, any later block's match is bigger — skip all
    # compute (the DMA keeps streaming, the VPU idles).
    run = (acc == BIG) if mode == "first" else (acc == acc)

    @pl.when(run)
    def _():
        # int32 compares (Mosaic's packed-i8 compare path miscompiles); the
        # position arithmetic + reduction only run for blocks that hit.
        Y = jnp.concatenate([main_ref[...], halo_ref[...]], axis=0).astype(jnp.int32)
        if kind == "needle":
            mask = _match_mask_block(Y, param_ref, offsets, BLOCK_ROWS, interpret)
        else:
            mask = _byteset_mask_block(Y, param_ref, BLOCK_ROWS)

        def reduce_hits():
            base = i * (BLOCK_ROWS * LANES)
            pos = (jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0) * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)) + base
            # bounds: [lo, hi] inclusive window of valid start positions.
            valid = mask & (pos >= bounds_ref[0, 0]) & (pos <= bounds_ref[0, 1])
            if mode == "first":
                local = jnp.min(jnp.where(valid, pos, jnp.int32(BIG)))
                out_ref[0, 0] = jnp.minimum(out_ref[0, 0], local)
            elif mode == "last":
                local = jnp.max(jnp.where(valid, pos, jnp.int32(-1)))
                out_ref[0, 0] = jnp.maximum(out_ref[0, 0], local)
            else:
                out_ref[0, 0] = out_ref[0, 0] + jnp.sum(valid.astype(jnp.int32))

        if mode == "first":
            # the SMEM accumulator already skips post-match blocks; gating
            # would just add a redundant reduction on the pre-match scan
            reduce_hits()
        else:
            # last/count must scan every block — skip the positional work for
            # the (typical) hitless blocks. jnp.any on an i1 mask trips a
            # Mosaic relayout bug; an integer sum reduces fine.
            hit = jnp.sum(mask.astype(jnp.int32)) > 0

            @pl.when(hit)
            def _():
                reduce_hits()


@functools.lru_cache(maxsize=512)
def _build(mode: str, kind: str, offsets: tuple, n_rows: int, interpret: bool):
    grid = (n_rows // BLOCK_ROWS,)
    halo_steps = BLOCK_ROWS // HALO_ROWS
    last_halo = n_rows // HALO_ROWS - 1
    n_params = max(len(offsets), 1) if kind == "needle" else 8

    in_specs = [
        pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        # Halo: the HALO_ROWS rows right after the main block (clamped at end).
        pl.BlockSpec(
            (HALO_ROWS, LANES),
            lambda i: (jnp.minimum((i + 1) * halo_steps, last_halo), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, n_params), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]

    kernel = functools.partial(_kernel, mode, kind, offsets, interpret)
    flops_per_byte = 6 * (len(offsets) if kind == "needle" else 10)

    def wrapped(hay2d, halo2d, params, bounds):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_byte * n_rows * LANES,
                bytes_accessed=n_rows * LANES,
                transcendentals=0,
            ),
            interpret=interpret,
        )(hay2d, halo2d, params, bounds)

    return jax.jit(wrapped)


def _anomaly_offsets(k: int) -> tuple:
    """≤ MAX_OFFSETS distinguishing byte offsets for a k-byte needle: the
    first/middle/last 4-byte words plus spread extras, all within the halo's
    reach (the reference picks 3 "anomaly" chars, ``find/serial.h:35``; we can
    afford 16 dense compares)."""
    reach = min(k - 1, MAX_OFFSET_REACH)
    offs = set(range(min(k, 4)))
    offs |= {reach - 3 + b for b in range(4) if reach - 3 + b >= 0}
    mid = (reach // 2) & ~3
    offs |= {mid + b for b in range(4) if mid + b <= reach}
    step = max(reach // 4, 1)
    probe = step
    while len(offs) < MAX_OFFSETS and probe < reach:
        offs.add(probe)
        probe += step
    return tuple(sorted(offs)[:MAX_OFFSETS])


def search_positions(
    hay2d: jnp.ndarray,  # (rows, 128) uint8, rows % BLOCK_ROWS == 0
    n: int,  # true byte length
    mode: str,  # first | last | count
    needle: np.ndarray | None = None,  # (k,) uint8
    byteset_words: np.ndarray | None = None,  # (8,) uint32
    lo: int = 0,
    hi: int | None = None,
) -> jnp.ndarray:
    """Streaming search over valid start positions in ``[lo, hi]``.

    Exact for needles ≤ MAX_OFFSETS bytes and for bytesets; longer needles get
    the *candidate* semantics (possible false positives) — use ``find_long``.
    Returns () int32: position, -1, or count.
    """
    rows = hay2d.shape[0]
    if needle is not None:
        k = int(needle.shape[0])
        offsets = tuple(range(k)) if k <= MAX_OFFSETS else _anomaly_offsets(k)
        params = np.zeros((1, len(offsets)), dtype=np.int32)
        params[0] = [needle[a] for a in offsets]
        kind = "needle"
    else:
        k = 1
        offsets = ()
        params = np.asarray(byteset_words, dtype=np.uint32).view(np.int32).reshape(1, 8)
        kind = "byteset"
    hi = n - k if hi is None else min(hi, n - k)
    bounds = np.array([[lo, hi]], dtype=np.int32)
    call = _build(mode, kind, offsets, rows, platform.pallas_interpret())
    out = call(hay2d, hay2d, jnp.asarray(params), jnp.asarray(bounds))
    res = out[0, 0]
    if mode == "first":
        return jnp.where(res == BIG, jnp.int32(-1), res)
    return res


@functools.lru_cache(maxsize=64)
def _verify_window(k: int):
    """Exact k-byte compare of hay2d[p : p+k] (flat) vs needle, jitted."""

    def run(hay2d, p, needle):
        rows_needed = (k + LANES - 1) // LANES + 1
        pr = p // LANES
        window = jax.lax.dynamic_slice(
            hay2d, (pr, 0), (rows_needed, LANES)
        ).reshape(-1)
        window = jax.lax.dynamic_slice_in_dim(window, p % LANES, k)
        return jnp.all(window == needle)

    return jax.jit(run)


def find_long(hay2d: jnp.ndarray, n: int, needle: np.ndarray, reverse: bool = False) -> int:
    """Exact first/last match for needles longer than MAX_OFFSETS: streamed
    anomaly filter + per-candidate exact verification (expected 1 round)."""
    k = int(needle.shape[0])
    nd = jnp.asarray(needle)
    verify = _verify_window(k)
    lo, hi = 0, n - k
    while lo <= hi:
        mode = "last" if reverse else "first"
        cand = int(search_positions(hay2d, n, mode, needle=needle, lo=lo, hi=hi))
        if cand < 0:
            return -1
        if bool(verify(hay2d, jnp.int32(cand), nd)):
            return cand
        if reverse:
            hi = cand - 1
        else:
            lo = cand + 1
    return -1
