"""Myers bit-parallel Levenshtein — 32 DP cells per lane word on the VPU.

TPU re-design of the reference's ``levenshtein_distance_myers`` (reference
``include/stringzillas/similarities/serial.hpp:2163-2417``: Myers/Hyyrö
bit-vector edit distance, 64 cells per machine word, unrolled word tiers).
TPUs have no 64-bit lanes, so each lane word packs **32** query cells; a
query of length m uses ``W = ceil(m/32)`` words laid down the sublane axis.

Lane packing mirrors ``candidate_lane_walker`` (``serial.hpp:599-613``): one
candidate per lane (128 per block), the query shared by the whole block. Per
candidate character the kernel computes

    Xv = Eq | VN
    Xh = (((Eq & VP) + VP) ^ VP) | Eq          (carry chained across words)
    Ph = VN | ~(Xh | VP);  Mh = VP & Xh
    score ± = bit m-1 of Ph / Mh
    Ph = (Ph << 1) | 1;  Mh <<= 1              (bit 31 carried across words)
    VP = Mh | ~(Xv | Ph);  VN = Ph & Xv

entirely in int32 vector registers — ~20 VPU ops per word per step for 32
lanes × 32 cells each. The match-mask ``Eq`` is built on the fly (no 256-entry
PEQ gather, which would serialize on the scalar unit): compare the query
column against the broadcast candidate character, multiply by per-row bit
values, and sum each 32-row group — all dense vector work, so the same kernel
serves byte strings and UTF-32 runes.

Unit costs only (match=0, mismatch=open=extend=1) — exactly the
configurations the reference routes to Myers (``serial.hpp:2620-2720``).
Results are exact edit distances, bit-identical to Wagner-Fischer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform

__all__ = ["myers_pallas", "pick_myers_lane_block"]

INT_MIN = -(1 << 31)


def pick_myers_lane_block(words: int, cand_len: int,
                          vmem_budget_bytes: int = 6 << 20) -> int:
    """Lanes per block: state is tiny (2W words), the candidate block and the
    per-step Eq temporaries dominate."""
    per_lane = (2 * words + 8) * 4 + cand_len * 4 + words * 32 * 4
    lanes = vmem_budget_bytes // max(per_lane, 1)
    lanes = max(128, min(2048, lanes))
    return 1 << (lanes.bit_length() - 1)


def _uless(a, b):
    """Unsigned a < b on int32 lanes (sign-flip trick)."""
    return (a ^ INT_MIN) < (b ^ INT_MIN)


def _kernel(words: int, cand_len: int, refs):
    q_ref, qlen_ref, cands_ref, clens_ref, out_ref = refs
    rows = words * 32
    q = q_ref[0]  # (rows, 1) int32, padded with -1 beyond qlen
    m = qlen_ref[0, 0, 0]
    clens = clens_ref[...]  # (1, lanes)
    lanes = clens.shape[1]

    # Bit-packing matrices for the MXU: S_lo/S_hi[(w, i)] = 2^(i-32w) for the
    # low/high 16 bits of word w. One-hot-weighted matmuls pack the (rows,
    # lanes) equality mask into (words, lanes) int32 words. bf16 operands
    # halve the vector traffic and stay exact: the entries are powers of two
    # (exactly representable) and the MXU accumulates in f32
    # (preferred_element_type), so sums of distinct powers < 2^16 are exact.
    wi = jax.lax.broadcasted_iota(jnp.int32, (words, rows), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (words, rows), 1)
    rel = ri - wi * 32
    S_lo = jnp.where((rel >= 0) & (rel < 16),
                     jnp.left_shift(jnp.int32(1), jnp.clip(rel, 0, 15)),
                     0).astype(jnp.bfloat16)
    S_hi = jnp.where((rel >= 16) & (rel < 32),
                     jnp.left_shift(jnp.int32(1), jnp.clip(rel - 16, 0, 15)),
                     0).astype(jnp.bfloat16)
    S_lohi = jnp.concatenate([S_lo, S_hi], axis=0)  # (2*words, rows)

    # VP init: bits [0, m) set, per word: full words below m/32, partial at it.
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (words, lanes), 0)
    in_word = jnp.clip(m - w_iota * 32, 0, 32)
    VP0 = jnp.where(in_word >= 32, jnp.int32(-1),
                    jnp.left_shift(jnp.int32(1), in_word) - 1)
    VN0 = jnp.zeros((words, lanes), jnp.int32)
    score0 = jnp.zeros((1, lanes), jnp.int32) + m

    # Score-test masks for bit (m-1): word index + in-word bit.
    top_word = (m - 1) >> 5
    top_bit = (m - 1) & 31
    is_top = (w_iota == top_word).astype(jnp.int32)  # (words, lanes)

    def step(j, carry):
        VP, VN, score = carry
        c_row = cands_ref[pl.ds(j - 1, 1), :]  # (1, lanes)

        # Eq: pack 32-row groups of (q == c) into int32 words via one stacked
        # MXU matmul (lo/hi 16-bit halves share the eqf read). The padded
        # query rows are -1 and never match a real char.
        eqf = (q == c_row).astype(jnp.bfloat16)  # (rows, lanes)
        lohi = jax.lax.dot_general(S_lohi, eqf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        Eq = (lohi[:words].astype(jnp.int32)
              | (lohi[words:].astype(jnp.int32) << 16))

        Xv = Eq | VN
        # (Eq & VP) + VP with the carry rippled across words via a
        # generate/propagate recurrence: word w generates a carry iff the raw
        # add overflowed (g), and propagates an incoming carry iff its raw sum
        # is all-ones (p). co[w] = g[w] | (p[w] & co[w-1]).
        t = Eq & VP
        s1 = t + VP
        if words == 1:
            s = s1
        else:
            # carry out of word w: g[w] | (p[w] & co[w-1]) — a parallel
            # prefix over the (g, p) carry semigroup, log2(words) depth
            # (Kogge-Stone), so 128-word queries cost 7 combine steps, not 127
            g = _uless(s1, t).astype(jnp.int32)  # (words, lanes)
            p = (s1 == -1).astype(jnp.int32)
            def down(X, d):  # X shifted d rows toward higher words, zero fill
                return jnp.concatenate(
                    [jnp.zeros((d, lanes), jnp.int32), X[:-d]], axis=0)

            d = 1
            while d < words:
                g = g | (p & down(g, d))
                p = p & down(p, d)
                d *= 2
            c_in = down(g, 1)  # carry INTO word w
            s = s1 + c_in
        Xh = (s ^ VP) | Eq

        Ph = VN | ~(Xh | VP)
        Mh = VP & Xh

        ph_top = jnp.sum(is_top * ((Ph >> top_bit) & 1), axis=0, keepdims=True)
        mh_top = jnp.sum(is_top * ((Mh >> top_bit) & 1), axis=0, keepdims=True)
        new_score = score + ph_top - mh_top

        # Shift left by one across words; bit 31 of word w feeds bit 0 of w+1.
        def shift_up(X, fill0):
            top = (X >> 31) & 1  # (words, lanes)
            shifted = X << 1
            fill = jnp.full((1, lanes), fill0, jnp.int32)
            prev = fill if words == 1 else jnp.concatenate([fill, top[:-1]], axis=0)
            return shifted | prev

        Ph = shift_up(Ph, 1)  # the reference's horizontal boundary D[0][j]=j
        Mh = shift_up(Mh, 0)
        VP_new = Mh | ~(Xv | Ph)
        VN_new = Ph & Xv

        live = j <= clens  # (1, lanes)
        VP = jnp.where(live, VP_new, VP)
        VN = jnp.where(live, VN_new, VN)
        score = jnp.where(live, new_score, score)
        return VP, VN, score

    _, _, score = jax.lax.fori_loop(1, cand_len + 1, step, (VP0, VN0, score0))
    # Degenerate empty query: distance is the candidate length (all inserts).
    out_ref[0] = jnp.where(m == 0, clens, score)


@functools.lru_cache(maxsize=256)
def _build(words: int, cand_len: int, n_queries: int, n_cands: int,
           lane_block: int, interpret: bool):
    grid = (n_queries, n_cands // lane_block)
    rows = words * 32

    in_specs = [
        pl.BlockSpec((1, rows, 1), lambda qi, cb: (qi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda qi, cb: (qi, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((cand_len, lane_block), lambda qi, cb: (0, cb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lane_block), lambda qi, cb: (0, cb), memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(_kernel, words, cand_len)
    cost = pl.CostEstimate(
        flops=25 * words * cand_len * lane_block,
        bytes_accessed=(rows * 4 + cand_len * lane_block * 4 + lane_block * 4),
        transcendentals=0,
    )

    def wrapped(queries_3d, qlens_3d, cands_t, clens):
        out = pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, lane_block), lambda qi, cb: (qi, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_queries, 1, n_cands), jnp.int32),
            cost_estimate=cost,
            interpret=interpret,
        )(queries_3d, qlens_3d, cands_t, clens)
        return out.reshape(n_queries, n_cands)

    return jax.jit(wrapped)


def myers_pallas(
    q_t: jnp.ndarray,  # (rows32, n_queries) int32 — query chars, pad -1
    qlens: jnp.ndarray,  # (n_queries, 1) int32
    cands_t: jnp.ndarray,  # (cand_len, n_cands) int32
    clens: jnp.ndarray,  # (1, n_cands) int32
    lane_block: int | None = None,
) -> jnp.ndarray:
    """All-pairs unit-cost edit distances ``(n_queries, n_cands) int32``.

    ``rows32`` must be a multiple of 32; queries longer than rows32 are a
    caller error. Lanes whose candidate is empty return ``qlen`` (all-gap)."""
    rows, n_queries = q_t.shape
    assert rows % 32 == 0
    words = rows // 32
    cand_len, n_cands = cands_t.shape
    if lane_block is None:
        lane_block = pick_myers_lane_block(words, cand_len)
    lane_block = min(lane_block, n_cands)
    if n_cands % lane_block:
        raise ValueError(f"n_cands {n_cands} not a multiple of lane_block {lane_block}")
    call = _build(words, cand_len, n_queries, n_cands, lane_block,
                  platform.pallas_interpret())
    queries_3d = q_t.T.reshape(n_queries, rows, 1)
    return call(queries_3d, qlens.reshape(n_queries, 1, 1), cands_t, clens)
