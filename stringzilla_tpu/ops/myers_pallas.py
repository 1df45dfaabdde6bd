"""Myers bit-parallel Levenshtein — 32 DP cells per lane word on the VPU.

TPU re-design of the reference's ``levenshtein_distance_myers`` (reference
``include/stringzillas/similarities/serial.hpp:2163-2417``: Myers/Hyyrö
bit-vector edit distance, 64 cells per machine word, unrolled word tiers).
TPUs have no 64-bit lanes, so each lane word packs **32** query cells; a
query of length m uses ``W = ceil(m/32)`` words laid down the sublane axis.

Lane packing mirrors ``candidate_lane_walker`` (``serial.hpp:599-613``): one
candidate per lane, the query shared by the whole block. Per candidate
character the kernel computes

    Xv = Eq | VN
    Xh = (((Eq & VP) + VP) ^ VP) | Eq          (carry chained across words)
    Ph = VN | ~(Xh | VP);  Mh = VP & Xh
    score ± = bit m-1 of Ph / Mh
    Ph = (Ph << 1) | 1;  Mh <<= 1              (bit 31 carried across words)
    VP = Mh | ~(Xv | Ph);  VN = Ph & Xv

entirely in int32 vector registers. The match-mask ``Eq`` is built on the
fly (no 256-entry PEQ gather, which would serialize on the scalar unit):
compare the query column against the broadcast candidate character and pack
each 32-row group of the mask into int32 words with one MXU matmul — dense
vector work, so the same kernel serves byte strings and UTF-32 runes.

Throughput structure (derived from on-chip ablation, round 2):

* **Query packing.** ``QPACK`` queries are stacked per grid block down the
  sublane axis — the matmul and the elementwise sweep both amortize better
  over one taller tile than over more grid steps. Cross-word carries and
  bit-shifts are masked at the query-group boundaries.
* **Eq prefetch (software pipeline).** The loop carries the *next* step's
  packed ``Eq`` so the MXU packing of step j+1 is issued before step j's
  VPU recurrence consumes ``Eq_j`` — measured ~1.4x on v5e (the matmul
  otherwise serializes with the carry chain).
* **Kogge-Stone carries.** The ``(Eq & VP) + VP`` carry ripples across words
  via a log2(W)-round generate/propagate prefix instead of a W-deep chain,
  so 128-word (4096-char) queries cost 7 combine rounds.

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

__all__ = ["myers_pallas", "pick_myers_lane_block", "query_pack_of"]

INT_MIN = -(1 << 31)

# Target element count of the per-step equality mask (qpack*rows, lanes) —
# the empirical sweet spot on v5e (bigger starves the pipeline, smaller
# leaves matmul latency exposed).
_EQ_ELEMS = 1 << 18


def query_pack_of(words: int) -> int:
    """Queries stacked per grid block: keep the stacked char rows near 512."""
    return max(1, min(8, 512 // (32 * max(words, 1))))


def pick_myers_lane_block(words: int, cand_len: int,
                          vmem_budget_bytes: int = 6 << 20) -> int:
    """Lanes per block: size the (qpack*rows, lanes) equality mask to
    ``_EQ_ELEMS`` elements, bounded by the VMEM budget."""
    qpack = query_pack_of(words)
    rows = 32 * words * qpack
    lanes = max(128, min(2048, _EQ_ELEMS // rows))
    per_lane = (2 * qpack * words + 8) * 4 + cand_len * 4 + rows * 8
    lanes = min(lanes, max(128, vmem_budget_bytes // max(per_lane, 1)))
    return 1 << (int(lanes).bit_length() - 1)


def _uless(a, b):
    """Unsigned a < b on int32 lanes (sign-flip trick)."""
    return (a ^ INT_MIN) < (b ^ INT_MIN)


def _kernel(words: int, cand_len: int, qpack: int, alphabet, refs):
    if alphabet is not None:
        q_ref, qlen_ref, cands_ref, clens_ref, arow_ref, acol_ref, out_ref = refs
    else:
        q_ref, qlen_ref, cands_ref, clens_ref, out_ref = refs
    rows = words * 32  # per query
    grows = qpack * words  # stacked state rows
    q = q_ref[0]  # (qpack*rows, 1) int32, padded with -1 beyond qlen
    clens = clens_ref[...]  # (1, lanes)
    lanes = clens.shape[1]

    # Per-group query lengths from SMEM scalars -> per-state-row vectors.
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (grows, lanes), 0)
    w_of_row = row_iota % words
    g_of_row = row_iota // words
    m_rows = jnp.zeros((grows, lanes), jnp.int32)
    for k in range(qpack):
        mk = qlen_ref[0, k, 0]
        m_rows = jnp.where(g_of_row == k, mk, m_rows)

    # Bit-packing matrix for the MXU: block-diagonal per query group;
    # S[(k, half, w), (k, i)] = 2^(i - 32w - 16*half) over the in-range bits.
    # One matmul packs the (qpack*rows, lanes) equality mask into
    # (qpack*2*words, lanes) 16-bit halves. bf16 operands are exact here:
    # entries are powers of two and the MXU accumulates in f32, so sums of
    # distinct powers < 2^16 are exact.
    oi = jax.lax.broadcasted_iota(jnp.int32, (qpack * 2 * words, qpack * rows), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (qpack * 2 * words, qpack * rows), 1)
    o_grp, o_rem = oi // (2 * words), oi % (2 * words)
    o_half, o_word = o_rem // words, o_rem % words
    r_grp, r_row = ri // rows, ri % rows
    rel = r_row - o_word * 32 - o_half * 16
    S = jnp.where((o_grp == r_grp) & (rel >= 0) & (rel < 16),
                  jnp.left_shift(jnp.int32(1), jnp.clip(rel, 0, 15)),
                  0).astype(jnp.bfloat16)

    # VP init: bits [0, m) set, per word: full words below m/32, partial at it.
    in_word = jnp.clip(m_rows - w_of_row * 32, 0, 32)
    VP0 = jnp.where(in_word >= 32, jnp.int32(-1),
                    jnp.left_shift(jnp.int32(1), in_word) - 1)
    VN0 = jnp.zeros((grows, lanes), jnp.int32)
    # VP0 doubles as the valid-bit mask for the END-ONLY score extraction:
    # no per-step score tracking (see the popcount epilogue below).

    # Boundary masks for cross-word shifts inside each query group.
    row_in_word = jax.lax.broadcasted_iota(jnp.int32, (grows, 1), 0) % words
    first_of_group = row_in_word == 0

    if alphabet is not None:
        # Bounded alphabet: fold the query into the packing matmul ONCE —
        # P[o, k] = Σ_i S8[o, i]·[q_i == alpha_k] — so the per-step mask
        # build compares the candidate char against the ``alphabet`` DISTINCT
        # QUERY BYTE VALUES (``arow``/``acol``, built by the caller) instead
        # of qpack·rows query rows. A candidate byte absent from every query
        # can never match, so the compressed value list is exact; the caller
        # falls back to the full 0..255 ladder rung when the query set is
        # wide. (The reference's analog is its 256-entry PEQ table,
        # serial.hpp:2189, built per pair instead of gathered per step.)
        # Exactness: the MXU truncates f32 operands to bf16 passes, so P is
        # packed in 8-BIT pieces — every entry is a sum of distinct powers
        # of two below 2^8 ≤ 255, exact in bf16; the per-step one-hot
        # matmul then selects single P entries with no accumulation error.
        oi8 = jax.lax.broadcasted_iota(jnp.int32, (qpack * 4 * words, qpack * rows), 0)
        ri8 = jax.lax.broadcasted_iota(jnp.int32, (qpack * 4 * words, qpack * rows), 1)
        o_grp8, o_rem8 = oi8 // (4 * words), oi8 % (4 * words)
        o_piece, o_word8 = o_rem8 // words, o_rem8 % words
        rel8 = (ri8 % rows) - o_word8 * 32 - o_piece * 8
        S8 = jnp.where((o_grp8 == (ri8 // rows)) & (rel8 >= 0) & (rel8 < 8),
                       jnp.left_shift(jnp.int32(1), jnp.clip(rel8, 0, 7)),
                       0).astype(jnp.bfloat16)
        Q1 = (q == arow_ref[...]).astype(jnp.bfloat16)  # (qpack*rows, alphabet)
        P = jax.lax.dot_general(S8, Q1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
        alpha_col = acol_ref[...]  # (alphabet, 1) int32 value column

    def build_eq(j):
        """Packed match mask for (1-based) step j; clamped read past the end
        so the pipelined prefetch of step cand_len+1 stays in bounds."""
        jc = jnp.minimum(j - 1, cand_len - 1)
        c_row = cands_ref[pl.ds(jc, 1), :]  # (1, lanes) int32
        if alphabet is not None:
            ohc = (alpha_col == c_row).astype(jnp.bfloat16)  # (alphabet, lanes)
            p4 = jax.lax.dot_general(P, ohc, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            p4 = p4.astype(jnp.int32).reshape(qpack, 4, words, lanes)
            return (p4[:, 0] | (p4[:, 1] << 8) | (p4[:, 2] << 16)
                    | (p4[:, 3] << 24)).reshape(grows, lanes)
        # Unbounded alphabet (UTF-32 runes): compare the query column
        # directly. Padded query rows are -1 and never match.
        eqf = (q == c_row).astype(jnp.bfloat16)  # (qpack*rows, lanes)
        lohi = jax.lax.dot_general(S, eqf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        lohi = lohi.astype(jnp.int32).reshape(qpack, 2, words, lanes)
        return (lohi[:, 0] | (lohi[:, 1] << 16)).reshape(grows, lanes)

    def step(j, carry):
        VP, VN, Eq = carry
        # Software pipeline: issue the MXU packing for step j+1 before the
        # VPU recurrence of step j — no data dependency between them.
        Eq_next = build_eq(j + 1)

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
            # Kogge-Stone parallel prefix over the (g, p) carry semigroup:
            # log2(words) combine rounds, masked at query-group boundaries.
            g = _uless(s1, t).astype(jnp.int32)  # (grows, lanes)
            p = (s1 == -1).astype(jnp.int32)

            def down(X, d):  # X shifted d rows toward higher words, zero fill
                shifted = jnp.concatenate(
                    [jnp.zeros((d, lanes), jnp.int32), X[:-d]], axis=0)
                if qpack == 1:
                    return shifted
                return jnp.where(row_in_word >= d, shifted, 0)

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

        # Shift left by one across words; bit 31 of word w feeds bit 0 of
        # w+1; bit 0 of each group's word 0 takes the horizontal boundary.
        def shift_up(X, fill0):
            top = (X >> 31) & 1  # (grows, lanes)
            shifted = X << 1
            prev = jnp.concatenate(
                [jnp.zeros((1, lanes), jnp.int32), top[:-1]], axis=0)
            if fill0:
                prev = jnp.where(first_of_group, fill0, prev)
            elif qpack > 1:
                prev = jnp.where(first_of_group, 0, prev)
            return shifted | prev

        Ph = shift_up(Ph, 1)  # the reference's horizontal boundary D[0][j]=j
        Mh = shift_up(Mh, 0)
        VP_new = Mh | ~(Xv | Ph)
        VN_new = Ph & Xv

        live = j <= clens  # (1, lanes)
        VP = jnp.where(live, VP_new, VP)
        VN = jnp.where(live, VN_new, VN)
        return VP, VN, Eq_next

    # Dynamic trip count: lanes freeze at their own end, so max(clen) steps
    # are exact for the whole block; callers length-sort candidates so
    # blocks are length-homogeneous (see _build_unrolled's lensort note).
    VPf, VNf, _ = jax.lax.fori_loop(
        1, jnp.max(clens) + 1, step, (VP0, VN0, build_eq(1)))

    # End-only score extraction: the live-freeze leaves each lane's state at
    # its OWN final column n = clen, where the Myers invariant gives
    # D[m][n] = D[0][n] + Σ_i Δv(i) = n + popcnt(VP & mask) - popcnt(VN &
    # mask) with mask = VP0 (bits [0, m)). Replacing the per-step top-bit
    # Ph/Mh tracking with this single epilogue measured 568 → 778 GCUPS at
    # the headline shape (the per-step reshape-sums were ~25% of the step).
    # Degenerate m = 0: the mask is empty, so the score is clen — the
    # all-inserts answer — with no special case.
    def _popcnt(v):
        v = v - ((v >> 1) & 0x55555555)
        v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
        v = (v + (v >> 4)) & 0x0F0F0F0F
        return (v * 0x01010101) >> 24

    delta = _popcnt(VPf & VP0) - _popcnt(VNf & VP0)
    out_ref[0] = jnp.broadcast_to(clens, (qpack, lanes)) + jnp.sum(
        delta.reshape(qpack, words, lanes), axis=1)


@functools.lru_cache(maxsize=256)
def _build(words: int, cand_len: int, n_qblocks: int, n_cands: int,
           lane_block: int, qpack: int, alphabet, lensort: bool,
           interpret: bool):
    grid = (n_qblocks, n_cands // lane_block)
    rows = words * 32

    in_specs = [
        pl.BlockSpec((1, qpack * rows, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qpack, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((cand_len, lane_block), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lane_block), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
    ]
    if alphabet is not None:
        # Distinct-value row/column for the folded Eq build (replicated).
        in_specs.append(pl.BlockSpec((1, alphabet), lambda qi, cb: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((alphabet, 1), lambda qi, cb: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, words, cand_len, qpack, alphabet)
    cost = pl.CostEstimate(
        flops=25 * qpack * words * cand_len * lane_block,
        bytes_accessed=(qpack * rows * 4 + cand_len * lane_block * 4
                        + qpack * lane_block * 4),
        transcendentals=0,
    )

    def wrapped(queries_3d, qlens_3d, cands_t, clens, *alpha):
        if lensort:
            # Device-side length sort → length-homogeneous lane blocks for
            # the kernel's dynamic trip count (see _build_unrolled).
            order = jnp.argsort(clens[0])
            cands_t = jnp.take(cands_t, order, axis=1)
            clens = jnp.take(clens, order, axis=1)
        out = pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, qpack, lane_block),
                                   lambda qi, cb: (qi, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_qblocks, qpack, n_cands),
                                           jnp.int32),
            cost_estimate=cost,
            interpret=interpret,
        )(queries_3d, qlens_3d, cands_t, clens, *alpha)
        out = out.reshape(n_qblocks * qpack, n_cands)
        if lensort:
            out = jnp.take(out, jnp.argsort(order), axis=1)
        return out

    return jax.jit(wrapped)


def _alpha_ladder(k: int) -> int:
    """Compressed-alphabet size rung: padded distinct-value count. Dyadic so
    corpora with drifting query sets reuse compiles."""
    n = max(16, 1 << (max(k, 1) - 1).bit_length())
    return min(n, 256)


def _distinct_alpha(q_t, alphabet: int):
    """Distinct query byte values (host side) padded to a ladder rung with
    ``-2`` (never equal to a query char, whose padding is -1, nor to any
    candidate byte ≥ 0). Returns ``(alpha_n, arow, acol)`` or the full-range
    fallback when the query set is too wide or ``q_t`` is a tracer (sharded
    callers trace this function inside shard_map)."""
    import os

    if isinstance(q_t, jax.core.Tracer) or os.environ.get("SZ_MYERS_NO_DISTINCT"):
        vals = np.arange(alphabet, dtype=np.int32)
        return alphabet, vals.reshape(1, -1), vals.reshape(-1, 1)
    qb = np.unique(np.asarray(q_t))
    qb = qb[(qb >= 0) & (qb < alphabet)].astype(np.int32)
    if len(qb) > 128:
        vals = np.arange(alphabet, dtype=np.int32)
        return alphabet, vals.reshape(1, -1), vals.reshape(-1, 1)
    n = _alpha_ladder(len(qb))
    vals = np.full(n, -2, np.int32)
    vals[: len(qb)] = qb
    return n, vals.reshape(1, -1), vals.reshape(-1, 1)


# ---------------------------------------------------------------------------
# Unrolled-words kernel — the round-5 headline path.
#
# The stacked kernel above lays a query's W words down the SUBLANE axis, so
# every cross-word interaction (the add's carry chain, the <<1 bit hand-off)
# is a cross-sublane roll plus a query-group boundary mask — at the bench
# shape those rolls + masks are ~35-40% of the per-step VPU work (measured,
# BENCH_NOTES round-5 ceiling note). This variant unrolls the W words into W
# SEPARATE (qpack, lanes) arrays (qpack=8 → exactly one sublane tile each):
# cross-word data flow becomes plain register references, carries become the
# textbook sequential generate/propagate chain (g | (p & c) per boundary),
# and every roll/mask disappears. The reference's Myers unrolls word tiers
# the same way for the same reason (serial.hpp:2163-2417 — 1/2/4/8-word
# variants with named locals per word).
#
# Eq build stays the folded-PEQ MXU matmul, but the packing matrix is built
# ONCE PER CALL outside the kernel (XLA) and P rides in as an operand; the
# matmul output rows are laid out (word, half, group) so each word's halves
# are 8-row-aligned slices — vreg-aligned, safe from the Mosaic sublane-
# offset pitfall documented above.
#
# The in-kernel matmul folds each word into TWO 16-bit halves (not four
# bytes): P's 16-bit entries exceed bf16's exact-integer range, so each half
# is split error-free into hi (top 8 bits, pre-shifted — a multiple of 256,
# hence an 8-bit significand, bf16-exact) and lo (low 8 bits) terms stacked
# along the contraction axis with a duplicated one-hot. One single-pass bf16
# matmul then accumulates hi+lo exactly in the MXU's f32 accumulator. The
# round-5 ablation (benches/myers_unrolled_ablate.py) measured this at
# 31.3 ms vs 36.3 ms for the 4×8-bit-piece build at the bench shape (fewer
# output rows to shift-OR back together on the VPU).
# ---------------------------------------------------------------------------

_UNROLL_QPACK = 8  # one full sublane tile per (word, group-stack) array


def _kernel_unrolled(words: int, cand_len: int, alphabet: int, refs):
    p_ref, qlen_ref, cands_ref, clens_ref, acol_ref, out_ref = refs
    qpack = _UNROLL_QPACK
    clens = clens_ref[...]  # (1, lanes)
    lanes = clens.shape[1]

    # Per-group query lengths from SMEM scalars -> (qpack, lanes).
    grp_iota = jax.lax.broadcasted_iota(jnp.int32, (qpack, lanes), 0)
    m_grp = jnp.zeros((qpack, lanes), jnp.int32)
    for k in range(qpack):
        m_grp = jnp.where(grp_iota == k, qlen_ref[0, k, 0], m_grp)

    # VP init per word: bits [0, m) set.
    VP0 = []
    for w in range(words):
        in_word = jnp.clip(m_grp - w * 32, 0, 32)
        VP0.append(jnp.where(in_word >= 32, jnp.int32(-1),
                             jnp.left_shift(jnp.int32(1), in_word) - 1))
    VP0 = tuple(VP0)
    VN0 = tuple(jnp.zeros((qpack, lanes), jnp.int32) for _ in range(words))

    P = p_ref[0]  # (words*2*qpack, 2*alphabet) — rows (w, half, group)
    alpha_col = acol_ref[...]  # (alphabet, 1)

    def build_eq(j):
        """Packed match masks for (1-based) step j — one int32 array per
        word. Clamped read past the end keeps the software pipeline's
        prefetch of step cand_len+1 in bounds.

        P holds each 16-bit half split error-free into hi/lo bf16 terms
        stacked along the contraction axis, so the duplicated one-hot makes
        ONE single-pass bf16 matmul reassemble the exact 16-bit value in the
        f32 accumulator (see the block comment above)."""
        jc = jnp.minimum(j - 1, cand_len - 1)
        c_row = cands_ref[pl.ds(jc, 1), :]  # (1, lanes)
        ohc = (alpha_col == c_row).astype(jnp.bfloat16)  # (alphabet, lanes)
        ohc2 = jnp.concatenate([ohc, ohc], axis=0)  # (2*alphabet, lanes)
        p2 = jax.lax.dot_general(P, ohc2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)  # (words*2*qpack, lanes)
        return tuple(p2[w * 2 * qpack:(w * 2 + 1) * qpack]
                     | (p2[(w * 2 + 1) * qpack:(w * 2 + 2) * qpack] << 16)
                     for w in range(words))

    def step(j, carry):
        VP, VN, Eq = carry
        # Software pipeline: the MXU packing for step j+1 has no dependency
        # on step j's VPU recurrence.
        Eq_next = build_eq(j + 1)

        Xv = [Eq[w] | VN[w] for w in range(words)]
        t = [Eq[w] & VP[w] for w in range(words)]
        s1 = [t[w] + VP[w] for w in range(words)]
        # Sequential carry chain across the unrolled words: word w generates
        # a carry iff its raw add overflowed, propagates iff the raw sum is
        # all-ones. W-1 generate/propagate registers, no rolls, no masks.
        s = [s1[0]]
        if words > 1:
            c = _uless(s1[0], t[0]).astype(jnp.int32)  # carry out of word 0
            for w in range(1, words):
                s.append(s1[w] + c)
                if w < words - 1:
                    g = _uless(s1[w], t[w]).astype(jnp.int32)
                    p = (s1[w] == -1)
                    c = g | jnp.where(p, c, 0)
        Xh = [(s[w] ^ VP[w]) | Eq[w] for w in range(words)]
        Ph = [VN[w] | ~(Xh[w] | VP[w]) for w in range(words)]
        Mh = [VP[w] & Xh[w] for w in range(words)]

        # Shift left by one across words: bit 31 of word w feeds bit 0 of
        # word w+1; word 0's bit 0 takes the horizontal boundary (1 for Ph —
        # the reference's D[0][j] = j — and 0 for Mh).
        PhS = [(Ph[0] << 1) | 1]
        MhS = [Mh[0] << 1]
        for w in range(1, words):
            PhS.append((Ph[w] << 1) | ((Ph[w - 1] >> 31) & 1))
            MhS.append((Mh[w] << 1) | ((Mh[w - 1] >> 31) & 1))

        live = j <= clens  # (1, lanes) — lanes freeze at their own end
        VPn = []
        VNn = []
        for w in range(words):
            VPn.append(jnp.where(live, MhS[w] | ~(Xv[w] | PhS[w]), VP[w]))
            VNn.append(jnp.where(live, PhS[w] & Xv[w], VN[w]))
        return tuple(VPn), tuple(VNn), Eq_next

    # Dynamic trip count: this block only needs max(clen) steps — lanes
    # freeze at their own end, so any bound ≥ the block max is exact, and
    # the caller length-sorts candidates so blocks are length-homogeneous
    # (see the lensort note in _build_unrolled). On the random ~N(100, 12.5)
    # headline shape this removes the ~25% of steps the padded cand_len=128
    # tile would spend with every lane frozen.
    VPf, VNf, _ = jax.lax.fori_loop(
        1, jnp.max(clens) + 1, step, (VP0, VN0, build_eq(1)))

    # End-only popcount scoring (same invariant as the stacked kernel):
    # D[m][n] = n + popcnt(VP & mask) - popcnt(VN & mask), mask = VP0.
    def _popcnt(v):
        v = v - ((v >> 1) & 0x55555555)
        v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
        v = (v + (v >> 4)) & 0x0F0F0F0F
        return (v * 0x01010101) >> 24

    delta = jnp.zeros((qpack, lanes), jnp.int32)
    for w in range(words):
        delta += _popcnt(VPf[w] & VP0[w]) - _popcnt(VNf[w] & VP0[w])
    out_ref[0] = jnp.broadcast_to(clens, (qpack, lanes)) + delta


@functools.lru_cache(maxsize=256)
def _build_unrolled(words: int, cand_len: int, n_qblocks: int, n_cands: int,
                    lane_block: int, alphabet: int, lensort: bool,
                    interpret: bool):
    qpack = _UNROLL_QPACK
    grid = (n_qblocks, n_cands // lane_block)
    rows = words * 32
    pieces, bits = 2, 16
    pr = words * pieces * qpack

    in_specs = [
        pl.BlockSpec((1, pr, 2 * alphabet), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, qpack, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((cand_len, lane_block), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lane_block), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((alphabet, 1), lambda qi, cb: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel_unrolled, words, cand_len, alphabet)
    cost = pl.CostEstimate(
        flops=25 * qpack * words * cand_len * lane_block,
        bytes_accessed=(pr * 2 * alphabet * 2 + cand_len * lane_block * 4
                        + qpack * lane_block * 4),
        transcendentals=0,
    )

    # The folded-PEQ packing matrix, built once per compile: output row
    # (w, half, k) holds 2^(r - 32w - 16*half) for query rows r of group k
    # in that 16-bit range — so the kernel's matmul output slices per word
    # are 8-row (= qpack) aligned. Exactness: S entries are single powers of
    # two ≤ 2^15 (bf16-exact) and per-output sums of distinct powers stay
    # < 2^16 — exact in the MXU's f32 accumulator.
    oi = np.arange(pr)[:, None]
    ri = np.arange(qpack * rows)[None, :]
    o_w, o_rem = oi // (pieces * qpack), oi % (pieces * qpack)
    o_piece, o_grp = o_rem // qpack, o_rem % qpack
    rel = (ri % rows) - o_w * 32 - o_piece * bits
    # Kept as numpy: converted inside the traced function so the constant is
    # embedded per trace context (a concrete jnp array here would carry a
    # device/mesh aval and break calls from inside shard_map).
    S16_np = np.where((o_grp == ri // rows) & (rel >= 0) & (rel < bits),
                      (1 << np.clip(rel, 0, bits - 1)).astype(np.int64),
                      0).astype(np.float32)

    def wrapped(queries_3d, qlens_3d, cands_t, clens, arow, acol):
        if lensort:
            # Length-sort candidates so each lane block is length-homogeneous
            # — the kernel's dynamic trip count then runs each block only to
            # ITS max candidate length instead of the padded tile length.
            # Everything (sort, gathers, inverse permutation) stays on
            # device inside this jit; exactness is untouched (the per-lane
            # freeze already handles any intra-block spread). The reference
            # performs the analogous scheduling host-side when it buckets
            # tasks by length (similarities.hpp small/large scheduler).
            order = jnp.argsort(clens[0])
            cands_t = jnp.take(cands_t, order, axis=1)
            clens = jnp.take(clens, order, axis=1)
        S16 = jnp.asarray(S16_np).astype(jnp.bfloat16)
        # P[b] = S16 @ one_hot(q_b) — per-query-block folded PEQ, computed
        # in XLA once per call and streamed to the kernel per grid row. The
        # 16-bit entries are then split error-free into hi (top 8 bits,
        # pre-shifted — multiples of 256 with 8-bit significands, bf16-exact)
        # and lo (low 8 bits) terms stacked along the contraction axis for
        # the kernel's single-pass bf16 matmul.
        q1 = (queries_3d == arow[None]).astype(jnp.bfloat16)  # (B, qp*rows, A)
        P = jax.lax.dot_general(S16, q1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        P = jnp.transpose(P, (1, 0, 2))  # (B, pr, A), entries < 2^16, exact
        hi = jnp.floor(P * (1.0 / 256.0)) * 256.0
        P = jnp.concatenate([hi, P - hi], axis=2).astype(jnp.bfloat16)
        out = pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, qpack, lane_block),
                                   lambda qi, cb: (qi, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_qblocks, qpack, n_cands),
                                           jnp.int32),
            cost_estimate=cost,
            interpret=interpret,
        )(P, qlens_3d, cands_t, clens, acol)
        out = out.reshape(n_qblocks * qpack, n_cands)
        if lensort:
            out = jnp.take(out, jnp.argsort(order), axis=1)
        return out

    return jax.jit(wrapped)


def myers_pallas(
    q_t: jnp.ndarray,  # (rows32, n_queries) int32 — query chars, pad -1
    qlens: jnp.ndarray,  # (n_queries, 1) int32
    cands_t: jnp.ndarray,  # (cand_len, n_cands) int32
    clens: jnp.ndarray,  # (1, n_cands) int32
    lane_block: int | None = None,
    alphabet: int | None = 256,
    qpack: int | None = None,
) -> jnp.ndarray:
    """All-pairs unit-cost edit distances ``(n_queries, n_cands) int32``.

    ``rows32`` must be a multiple of 32; queries longer than rows32 are a
    caller error. Lanes whose candidate is empty return ``qlen`` (all-gap).
    ``alphabet=256`` (the default) asserts all chars are bytes and enables
    the folded one-hot Eq build; pass ``alphabet=None`` for UTF-32 runes or
    any unbounded int32 alphabet."""
    rows, n_queries = q_t.shape
    assert rows % 32 == 0
    words = rows // 32
    # The folded-PEQ build materializes (4·words, rows) + (rows, 256)
    # matrices in VMEM — past ~32 words that overflows the 16 MB scoped
    # budget (caught by the on-chip sweep at words=128), and the one-hot
    # win only matters at the short-string hot shapes anyway.
    if words > 32:
        alphabet = None
    alpha_args = ()
    if alphabet is not None:
        alphabet, arow, acol = _distinct_alpha(q_t, alphabet)
        alpha_args = (jnp.asarray(arow), jnp.asarray(acol))
    cand_len, n_cands = cands_t.shape
    import os

    use_unrolled = (alphabet is not None and words <= 8 and qpack is None
                    and not os.environ.get("SZ_MYERS_STACKED"))
    if use_unrolled:
        qpack = _UNROLL_QPACK
        if lane_block is None:
            # On-chip sweep (round 5): wider blocks than the stacked tuning —
            # 1024 lanes at words=4 reads ~15% over 512 (1132 vs 978 GCUPS in
            # one window); 2048 is within noise of 1024, 4096 slightly down.
            lane_block = max(
                128, min(2048, (1 << 20) // (32 * words * qpack)))
            lane_block = 1 << (int(lane_block).bit_length() - 1)
        lane_block = min(lane_block, n_cands)
        if n_cands % lane_block:
            raise ValueError(
                f"n_cands {n_cands} not a multiple of lane_block {lane_block}")
        n_qpad = -(-n_queries // qpack) * qpack
        if n_qpad != n_queries:
            q_t = jnp.concatenate(
                [q_t, jnp.full((rows, n_qpad - n_queries), -1, jnp.int32)],
                axis=1)
            qlens = jnp.concatenate(
                [jnp.asarray(qlens),
                 jnp.zeros((n_qpad - n_queries, 1), jnp.int32)], axis=0)
        call = _build_unrolled(words, cand_len, n_qpad // qpack, n_cands,
                               lane_block, alphabet,
                               not os.environ.get("SZ_MYERS_NO_LENSORT"),
                               platform.pallas_interpret())
        queries_3d = q_t.T.reshape(n_qpad // qpack, qpack * rows, 1)
        out = call(queries_3d,
                   jnp.asarray(qlens).reshape(n_qpad // qpack, qpack, 1),
                   cands_t, clens, *alpha_args)
        return out[:n_queries]
    if lane_block is None:
        lane_block = pick_myers_lane_block(words, cand_len)
    lane_block = min(lane_block, n_cands)
    if n_cands % lane_block:
        raise ValueError(f"n_cands {n_cands} not a multiple of lane_block {lane_block}")
    if qpack is None:
        qpack = query_pack_of(words)
    n_qpad = -(-n_queries // qpack) * qpack
    if n_qpad != n_queries:
        q_t = jnp.concatenate(
            [q_t, jnp.full((rows, n_qpad - n_queries), -1, jnp.int32)], axis=1)
        qlens = jnp.concatenate(
            [jnp.asarray(qlens), jnp.zeros((n_qpad - n_queries, 1), jnp.int32)],
            axis=0)
    call = _build(words, cand_len, n_qpad // qpack, n_cands, lane_block,
                  qpack, alphabet,
                  not os.environ.get("SZ_MYERS_NO_LENSORT"),
                  platform.pallas_interpret())
    queries_3d = q_t.T.reshape(n_qpad // qpack, qpack * rows, 1)
    out = call(queries_3d, jnp.asarray(qlens).reshape(n_qpad // qpack, qpack, 1),
               cands_t, clens, *alpha_args)
    return out[:n_queries]
