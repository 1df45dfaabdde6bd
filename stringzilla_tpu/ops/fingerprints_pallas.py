"""Pallas TPU kernel for rolling MinHash fingerprints — exact 52-bit modular
arithmetic in int32 lanes.

TPUs have no f64 ALUs and no 64-bit integer lanes, but the reference's
production hasher (``floating_rolling_hasher<f64>``, reference
``fingerprints/serial.hpp:445-560``) only ever manipulates *integers* below
2^52, and its moduli sit just past 2^42 (``default_modulo_base_k``,
serial.hpp:1247). We therefore re-express the state exactly in TWO int32
limbs — (low 21 bits, open-ended rest) — chosen so every product stays
inside int32:

* ``s0*mult <= (2^21-1)*639 ~ 1.34e9`` and the top limb
  ``s1 <= m>>21 ~ 2147484`` (just past 2^21) gives ``s1*mult ~ 1.37e9``;
* fused roll ``x = state*mult + fused_disc*old_term + new_term`` needs no
  overflow limb: the open-ended ``p1`` carries ``x = p1*2^21 + p0 < 2^52``
  exactly into the quotient estimate;
* Barrett reduction with an f32 quotient *estimate* followed by exact
  integer correction: ``q ≈ floor(x * 1/m)`` can be off by ±1
  (``q*m1 <= 897*2147484 < 2^31``), so one conditional ``+m`` and one
  conditional ``-m`` pin ``r = x mod m`` exactly — bit-identical to the
  reference's f64 path (which asserts its own result equals true ``fmod``,
  serial.hpp:552-560);
* the running minimum is tracked lexicographically over the limb pair and
  truncated to u32 on export (``serial.hpp:1284-1293``).

The previous 3x16-bit-limb formulation cost ~116 lane-ops per dim-hash;
this one is ~62 (see BENCH_NOTES "Round-5 fingerprints") — exactness proven
against both the old kernel and the f64 oracle in
``benches/fingerprints_ablate.py`` and ``tests/test_fingerprints.py``.
The byte loop is unrolled 8x by default (``unroll=8``): the on-chip
ablation reads 16.8 (3-limb) → 25.9 (2-limb) → 49.2 G dim-hash/s
(2-limb, 8x-unrolled) at the (192, 4096, 256) shape — the unroll
amortizes the fori_loop trip and lets Mosaic software-pipeline the
dynamic row loads; a register-history variant that shifts old terms
through live registers instead of re-loading measured SLOWER (37.3).

Layout: dimensions (of one window width) go down the sublane axis, documents
across the 128 lanes; each grid program owns one document block. The byte loop
is a ``fori_loop`` whose every step is dense (dims x docs) VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform

__all__ = ["fingerprint_all_groups", "pack_limbs"]

LIMB = 21
MASK = (1 << LIMB) - 1
SENTINEL_HI = 1 << 22  # valid top limbs are <= ~2^21.04


def pack_limbs(values: np.ndarray) -> np.ndarray:
    """int64 (G,) → (2, G) int32 limbs (low 21 bits, open-ended rest)."""
    v = np.asarray(values, dtype=np.int64)
    return np.stack([
        (v & MASK).astype(np.int32),
        (v >> LIMB).astype(np.int32),
    ])


def _kernel(doc_len: int, group_sizes: tuple, unroll: int, refs):
    """One launch computes ALL window-width groups: the dimension axis is the
    concatenation of per-width row blocks (``group_sizes``), each block's
    width a runtime SMEM scalar. A single pass over the document bytes pushes
    (while the window fills) and rolls (once full) every group simultaneously —
    8× fewer launches and 8× fewer byte reads than one kernel per width."""
    (docs_ref, lens_ref, widths_ref, mult_ref, m_ref, fd_ref, inv_ref,
     hash_ref, count_ref) = refs
    dims = mult_ref.shape[0]
    lanes = docs_ref.shape[1]

    mult = mult_ref[...]  # (dims, 1)
    m0, m1 = m_ref[0], m_ref[1]  # (dims, 1) each
    f0, f1 = fd_ref[0], fd_ref[1]
    inv_m = inv_ref[...]  # (dims, 1) f32
    lens = lens_ref[...]  # (1, lanes)

    # Per-row window width column (dims, 1): group scalars broadcast to rows.
    wrow = jnp.concatenate(
        [jnp.full((sz, 1), widths_ref[0, g], jnp.int32)
         for g, sz in enumerate(group_sizes)], axis=0)
    wm1 = wrow - 1

    zeros = jnp.zeros((dims, lanes), jnp.int32)
    init = (zeros, zeros, zeros,
            jnp.full((dims, lanes), SENTINEL_HI, jnp.int32), zeros)

    def _row(t):
        """One byte row as int32 terms (+1)."""
        return docs_ref[pl.ds(t, 1), :] + 1

    def body(t, carry):
        s0, s1, mn0, mn1, count = carry
        term = _row(t)  # (1, lanes)
        # Discarded term per group: zero while the group's window still fills
        # (t < w), turning the fused roll into a plain push.
        parts = []
        for g, sz in enumerate(group_sizes):
            w = widths_ref[0, g]
            og = jnp.where(t >= w, _row(jnp.maximum(t - w, 0)), 0)
            parts.append(jnp.broadcast_to(og, (sz, lanes)))
        old_term = jnp.concatenate(parts, axis=0)  # (dims, lanes)

        # Fused roll; p1 stays open-ended (< ~1.93e9), no third limb.
        p0 = s0 * mult + f0 * old_term + term
        p1 = s1 * mult + f1 * old_term
        p1 += p0 >> LIMB
        p0 &= MASK

        # Barrett: f32 quotient estimate, one +m and one -m correction.
        xf = p1.astype(jnp.float32) * 2097152.0 + p0.astype(jnp.float32)
        q = jnp.maximum(jnp.floor(xf * inv_m).astype(jnp.int32), 0)
        r0 = p0 - q * m0
        r1 = p1 - q * m1
        r1 += r0 >> LIMB
        r0 &= MASK

        neg = r1 < 0
        a0 = r0 + jnp.where(neg, m0, 0)
        a1 = r1 + jnp.where(neg, m1, 0)
        a1 += a0 >> LIMB
        a0 &= MASK
        r0, r1 = a0, a1

        ge = (r1 > m1) | ((r1 == m1) & (r0 >= m0))
        s0 = r0 - jnp.where(ge, m0, 0)
        s1 = r1 - jnp.where(ge, m1, 0)
        s1 += s0 >> LIMB
        s0 &= MASK

        # A row's hash is a full-window value from t = w-1 onward; docs shorter
        # than the window never update (lens <= w-1 ⇒ t < lens fails first).
        upd = (t >= wm1) & (t < lens)  # (dims, lanes)
        lt = (s1 < mn1) | ((s1 == mn1) & (s0 < mn0))
        eq = (s1 == mn1) & (s0 == mn0)
        count = jnp.where(upd & lt, 1, jnp.where(upd & eq, count + 1, count))
        take = upd & lt
        mn0 = jnp.where(take, s0, mn0)
        mn1 = jnp.where(take, s1, mn1)
        return s0, s1, mn0, mn1, count

    if unroll > 1:
        def block(b, carry):
            t0 = b * unroll
            for k in range(unroll):
                carry = body(t0 + k, carry)
            return carry

        n_blocks = doc_len // unroll
        carry = jax.lax.fori_loop(0, n_blocks, block, init)
        s0, s1, mn0, mn1, count = jax.lax.fori_loop(
            n_blocks * unroll, doc_len, body, carry)
    else:
        s0, s1, mn0, mn1, count = jax.lax.fori_loop(0, doc_len, body, init)

    skipped = mn1 >= SENTINEL_HI
    hash32 = (mn1 << LIMB) | mn0  # low 32 bits of the ~42-bit minimum
    hash_ref[...] = jnp.where(skipped, jnp.int32(-1), hash32)
    count_ref[...] = jnp.where(skipped, 0, count)


@functools.lru_cache(maxsize=256)
def _build_call(doc_len: int, group_sizes: tuple, n_docs: int, lane_block: int,
                unroll: int, interpret: bool):
    dims = sum(group_sizes)
    n_groups = len(group_sizes)
    grid = (n_docs // lane_block,)
    spec_docs = pl.BlockSpec((doc_len, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)
    spec_lens = pl.BlockSpec((1, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)
    spec_widths = pl.BlockSpec((1, n_groups), lambda d: (0, 0), memory_space=pltpu.SMEM)
    spec_dim = pl.BlockSpec((dims, 1), lambda d: (0, 0), memory_space=pltpu.VMEM)
    spec_limbs = pl.BlockSpec((2, dims, 1), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((dims, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, doc_len, group_sizes, unroll)

    def wrapped(docs_u8, *args):
        # Docs cross the host↔device link as u8 (4× less traffic); Mosaic has
        # no dynamic single-row i8 loads, so XLA widens to i32 on device.
        docs32 = docs_u8.astype(jnp.int32)
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=[spec_docs, spec_lens, spec_widths, spec_dim, spec_limbs,
                      spec_limbs, spec_dim],
            out_specs=(spec_out, spec_out),
            out_shape=(
                jax.ShapeDtypeStruct((dims, n_docs), jnp.int32),
                jax.ShapeDtypeStruct((dims, n_docs), jnp.int32),
            ),
            interpret=interpret,
        )(docs32, *args)

    return jax.jit(wrapped)


def fingerprint_all_groups(
    docs_t: jnp.ndarray,  # (doc_len, n_docs) int32 — docs across lanes
    lens: jnp.ndarray,  # (1, n_docs) int32
    widths: jnp.ndarray,  # (1, n_groups) int32 — per-group window widths
    group_sizes: tuple,  # static: dims rows per width group, concat order
    mult: jnp.ndarray,  # (dims, 1) int32
    m_limbs: jnp.ndarray,  # (2, dims, 1) int32
    fd_limbs: jnp.ndarray,  # (2, dims, 1) int32
    inv_m: jnp.ndarray,  # (dims, 1) float32
    lane_block: int = 128,
    unroll: int = 8,
):
    """MinHash + count-min for every dimension of every window width in one
    kernel launch. Returns ``(min_hash int32 (dims, n_docs), counts int32
    (dims, n_docs))`` where min_hash bit-patterns are the u32 hashes."""
    doc_len, n_docs = docs_t.shape
    lane_block = min(lane_block, n_docs)
    call = _build_call(doc_len, tuple(int(s) for s in group_sizes), n_docs,
                       lane_block, unroll, platform.pallas_interpret())
    return call(docs_t, lens, widths, mult, m_limbs, fd_limbs, inv_m)
