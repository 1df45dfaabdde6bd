"""Attribute Myers kernel time: full vs eq-only vs recurrence-only vs empty.

Copies the kernel body with parts stubbed (results are WRONG for stubs —
timing only) to find where the step time goes at the bench shape.

Usage: python benches/myers_ablate.py [duration_s]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from stringzilla_tpu.ops import myers_pallas as M  # noqa: E402

QPACK, LANES, WORDS, CAND_LEN, ALPHA = 8, 256, 4, 128, 32
ROWS = WORDS * 32
GROWS = QPACK * WORDS


def kernel(mode, refs):
    q_ref, qlen_ref, cands_ref, clens_ref, arow_ref, acol_ref, out_ref = refs
    rows, words, qpack, alphabet = ROWS, WORDS, QPACK, ALPHA
    grows = GROWS
    q = q_ref[0]
    clens = clens_ref[...]
    lanes = clens.shape[1]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (grows, lanes), 0)
    w_of_row = row_iota % words
    g_of_row = row_iota // words
    grp_iota = jax.lax.broadcasted_iota(jnp.int32, (qpack, lanes), 0)
    m_rows = jnp.zeros((grows, lanes), jnp.int32)
    m_grp = jnp.zeros((qpack, lanes), jnp.int32)
    for k in range(qpack):
        mk = qlen_ref[0, k, 0]
        m_rows = jnp.where(g_of_row == k, mk, m_rows)
        m_grp = jnp.where(grp_iota == k, mk, m_grp)

    oi8 = jax.lax.broadcasted_iota(jnp.int32, (qpack * 4 * words, qpack * rows), 0)
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (qpack * 4 * words, qpack * rows), 1)
    o_grp8, o_rem8 = oi8 // (4 * words), oi8 % (4 * words)
    o_piece, o_word8 = o_rem8 // words, o_rem8 % words
    rel8 = (ri8 % rows) - o_word8 * 32 - o_piece * 8
    S8 = jnp.where((o_grp8 == (ri8 // rows)) & (rel8 >= 0) & (rel8 < 8),
                   jnp.left_shift(jnp.int32(1), jnp.clip(rel8, 0, 7)),
                   0).astype(jnp.bfloat16)
    Q1 = (q == arow_ref[...]).astype(jnp.bfloat16)
    P = jax.lax.dot_general(S8, Q1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    alpha_col = acol_ref[...]

    # Piece-major packing matrix: output row = piece*(qpack*words) + g*words
    # + w, so the four 8-bit pieces are CONTIGUOUS (grows, lanes) blocks
    # (the group-major order makes p4[:, k] a stride-16 sublane gather).
    oiP = jax.lax.broadcasted_iota(jnp.int32, (4 * grows, qpack * rows), 0)
    riP = jax.lax.broadcasted_iota(jnp.int32, (4 * grows, qpack * rows), 1)
    o_pieceP, o_remP = oiP // grows, oiP % grows
    o_grpP, o_wordP = o_remP // words, o_remP % words
    relP = (riP % rows) - o_wordP * 32 - o_pieceP * 8
    S8P = jnp.where((o_grpP == (riP // rows)) & (relP >= 0) & (relP < 8),
                    jnp.left_shift(jnp.int32(1), jnp.clip(relP, 0, 7)),
                    0).astype(jnp.bfloat16)
    PP = jax.lax.dot_general(S8P, Q1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)

    def build_eq_piecemajor(j):
        jc = jnp.minimum(j - 1, CAND_LEN - 1)
        c_row = cands_ref[pl.ds(jc, 1), :]
        ohc = (alpha_col == c_row).astype(jnp.bfloat16)
        p4 = jax.lax.dot_general(PP, ohc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)  # (4*grows, lanes)
        return (p4[0 * grows:1 * grows] | (p4[1 * grows:2 * grows] << 8)
                | (p4[2 * grows:3 * grows] << 16)
                | (p4[3 * grows:4 * grows] << 24))

    in_word = jnp.clip(m_rows - w_of_row * 32, 0, 32)
    VP0 = jnp.where(in_word >= 32, jnp.int32(-1),
                    jnp.left_shift(jnp.int32(1), in_word) - 1)
    VN0 = jnp.zeros((grows, lanes), jnp.int32)
    score0 = m_grp

    top_word = (m_rows - 1) >> 5
    top_bit = jnp.maximum(m_rows - 1, 0) & 31
    is_top = (w_of_row == top_word).astype(jnp.int32)
    row_in_word = jax.lax.broadcasted_iota(jnp.int32, (grows, 1), 0) % words
    first_of_group = row_in_word == 0

    def build_eq(j):
        jc = jnp.minimum(j - 1, CAND_LEN - 1)
        c_row = cands_ref[pl.ds(jc, 1), :]
        ohc = (alpha_col == c_row).astype(jnp.bfloat16)
        p4 = jax.lax.dot_general(P, ohc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p4 = p4.astype(jnp.int32).reshape(qpack, 4, words, lanes)
        return (p4[:, 0] | (p4[:, 1] << 8) | (p4[:, 2] << 16)
                | (p4[:, 3] << 24)).reshape(grows, lanes)

    T = 8

    def build_eq_block(b):
        """Packed Eq for steps b*T+1 .. b*T+T as one (grows, T*lanes) tile:
        one matmul + one assembly for T steps; step t's mask is the
        lane-aligned slice [:, t*lanes:(t+1)*lanes]."""
        j0 = jnp.minimum(b, CAND_LEN // T - 1) * T  # ×T AFTER the clamp so
        blk = cands_ref[pl.ds(j0, T), :]  # Mosaic can prove 8-alignment
        rowi = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        c_flat = jnp.concatenate(
            [jnp.sum(jnp.where(rowi == t, blk, 0), axis=0, keepdims=True)
             for t in range(T)], axis=1)  # (1, T*lanes)
        ohc = (alpha_col == c_flat).astype(jnp.bfloat16)  # (alpha, T*lanes)
        p4 = jax.lax.dot_general(P, ohc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p4 = p4.astype(jnp.int32).reshape(qpack, 4, words, T * lanes)
        return (p4[:, 0] | (p4[:, 1] << 8) | (p4[:, 2] << 16)
                | (p4[:, 3] << 24)).reshape(grows, T * lanes)

    def step_core(j, VP, VN, score, Eq, with_score):
        Xv = Eq | VN
        t = Eq & VP
        s1 = t + VP
        g = M._uless(s1, t).astype(jnp.int32)
        p = (s1 == -1).astype(jnp.int32)

        def down(X, d):
            shifted = jnp.concatenate(
                [jnp.zeros((d, lanes), jnp.int32), X[:-d]], axis=0)
            return jnp.where(row_in_word >= d, shifted, 0)

        d = 1
        while d < WORDS:
            g = g | (p & down(g, d))
            p = p & down(p, d)
            d *= 2
        s = s1 + down(g, 1)
        Xh = (s ^ VP) | Eq
        Ph = VN | ~(Xh | VP)
        Mh = VP & Xh
        new_score = score
        if with_score:
            ph_top = jnp.sum((is_top * ((Ph >> top_bit) & 1))
                             .reshape(qpack, words, lanes), axis=1)
            mh_top = jnp.sum((is_top * ((Mh >> top_bit) & 1))
                             .reshape(qpack, words, lanes), axis=1)
            new_score = score + ph_top - mh_top

        def shift_up(X, fill0):
            top = (X >> 31) & 1
            shifted = X << 1
            prev = jnp.concatenate(
                [jnp.zeros((1, lanes), jnp.int32), top[:-1]], axis=0)
            prev = jnp.where(first_of_group, fill0, prev)
            return shifted | prev

        Ph = shift_up(Ph, 1)
        Mh = shift_up(Mh, 0)
        VP_new = Mh | ~(Xv | Ph)
        VN_new = Ph & Xv
        live = j <= clens
        VP = jnp.where(live, VP_new, VP)
        VN = jnp.where(live, VN_new, VN)
        score = jnp.where(live, new_score, score)
        return VP, VN, score

    def block_step(b, carry):
        VP, VN, score, EqB = carry
        EqB_next = build_eq_block(b + 1)
        for t in range(T):
            Eq_t = jax.lax.dynamic_slice_in_dim(EqB, 0, lanes, axis=1) \
                if False else EqB[:, t * lanes:(t + 1) * lanes]
            VP, VN, score = step_core(b * T + t + 1, VP, VN, score, Eq_t,
                                      mode != "eqT_final")
        return VP, VN, score, EqB_next

    def step(j, carry):
        VP, VN, score, Eq = carry
        if mode == "eq_only":
            Eq_next = build_eq(j + 1)
            # consume Eq trivially so the pipeline shape stays
            score = score + jnp.sum(Eq.reshape(qpack, words, lanes), axis=1)
            return VP, VN, score, Eq_next
        if mode == "no_eq":
            Eq_next = Eq  # constant reuse — no MXU work
        elif mode == "eqP_final":
            Eq_next = build_eq_piecemajor(j + 1)
        else:
            Eq_next = build_eq(j + 1)

        Xv = Eq | VN
        t = Eq & VP
        s1 = t + VP
        g = M._uless(s1, t).astype(jnp.int32)
        p = (s1 == -1).astype(jnp.int32)

        def down(X, d):
            shifted = jnp.concatenate(
                [jnp.zeros((d, lanes), jnp.int32), X[:-d]], axis=0)
            return jnp.where(row_in_word >= d, shifted, 0)

        d = 1
        while d < WORDS:
            g = g | (p & down(g, d))
            p = p & down(p, d)
            d *= 2
        c_in = down(g, 1)
        s = s1 + c_in
        Xh = (s ^ VP) | Eq

        Ph = VN | ~(Xh | VP)
        Mh = VP & Xh

        if mode in ("no_score", "score_final", "eqP_final"):
            new_score = score
        else:
            ph_top = jnp.sum((is_top * ((Ph >> top_bit) & 1))
                             .reshape(qpack, words, lanes), axis=1)
            mh_top = jnp.sum((is_top * ((Mh >> top_bit) & 1))
                             .reshape(qpack, words, lanes), axis=1)
            new_score = score + ph_top - mh_top

        def shift_up(X, fill0):
            top = (X >> 31) & 1
            shifted = X << 1
            prev = jnp.concatenate(
                [jnp.zeros((1, lanes), jnp.int32), top[:-1]], axis=0)
            if fill0:
                prev = jnp.where(first_of_group, fill0, prev)
            else:
                prev = jnp.where(first_of_group, 0, prev)
            return shifted | prev

        Ph = shift_up(Ph, 1)
        Mh = shift_up(Mh, 0)
        VP_new = Mh | ~(Xv | Ph)
        VN_new = Ph & Xv

        live = j <= clens
        VP = jnp.where(live, VP_new, VP)
        VN = jnp.where(live, VN_new, VN)
        score = jnp.where(live, new_score, score)
        return VP, VN, score, Eq_next

    if mode.startswith("eqT"):
        VPf, VNf, score, _ = jax.lax.fori_loop(
            0, CAND_LEN // T, block_step, (VP0, VN0, score0, build_eq_block(0)))
    else:
        VPf, VNf, score, _ = jax.lax.fori_loop(
            1, CAND_LEN + 1, step, (VP0, VN0, score0, build_eq(1)))
    if mode in ("score_final", "eqT_final", "eqP_final"):
        # Exact end-only scoring: D[m][n] = n + popcnt(VP & mask) - popcnt(VN
        # & mask), the vertical-delta sum down the final (frozen) column.
        # VP0 is exactly the valid-bit mask (bits [0, m) per group).
        def popcnt(v):
            v = v - ((v >> 1) & 0x55555555)
            v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
            v = (v + (v >> 4)) & 0x0F0F0F0F
            return (v * 0x01010101) >> 24

        delta = popcnt(VPf & VP0) - popcnt(VNf & VP0)
        score = jnp.broadcast_to(clens, (qpack, lanes)) + jnp.sum(
            delta.reshape(qpack, words, lanes), axis=1)
    out_ref[0] = score


def build(mode, n_qblocks, n_cands):
    grid = (n_qblocks, n_cands // LANES)
    in_specs = [
        pl.BlockSpec((1, QPACK * ROWS, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, QPACK, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((CAND_LEN, LANES), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ALPHA), lambda qi, cb: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ALPHA, 1), lambda qi, cb: (0, 0), memory_space=pltpu.VMEM),
    ]

    def wrapped(*args):
        return pl.pallas_call(
            lambda *refs: kernel(mode, refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, QPACK, LANES), lambda qi, cb: (qi, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_qblocks, QPACK, n_cands), jnp.int32),
        )(*args)

    return jax.jit(lambda *a: wrapped(*a))


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    rng = np.random.default_rng(42)
    n_queries, n_cands, mean_len = 128, 32768, 100

    def make_batch(count, maxlen):
        lens = np.clip(rng.normal(mean_len, mean_len / 8, count).astype(np.int32),
                       8, maxlen)
        chars = rng.integers(97, 123, size=(maxlen, count), dtype=np.int32)
        mask = np.arange(maxlen)[:, None] < lens[None, :]
        return np.where(mask, chars, 0), lens

    q_chars, q_lens = make_batch(n_queries, ROWS)
    q_t = np.where(np.arange(ROWS)[:, None] < q_lens[None, :], q_chars, -1)
    c_chars, c_lens = make_batch(n_cands, CAND_LEN)
    n_qblocks = n_queries // QPACK
    alpha = np.full(ALPHA, -2, np.int32)
    alpha[:26] = np.arange(97, 123)
    args = (jnp.asarray(q_t.T.reshape(n_qblocks, QPACK * ROWS, 1).astype(np.int32)),
            jnp.asarray(q_lens.reshape(n_qblocks, QPACK, 1)),
            jnp.asarray(c_chars),
            jnp.asarray(c_lens.reshape(1, -1)),
            jnp.asarray(alpha.reshape(1, -1)),
            jnp.asarray(alpha.reshape(-1, 1)))
    cells = float(np.outer(q_lens.astype(np.int64), c_lens.astype(np.int64)).sum())

    want = None
    for mode in ("full", "score_final", "eqP_final", "full"):
        run = build(mode, n_qblocks, n_cands)
        out = run(*args)
        if mode == "full" and want is None:
            want = np.asarray(out)
        if mode in ("score_final", "eqT", "eqT_final", "eqP_final"):
            got = np.asarray(out)
            print(f"{mode} exact:", bool((got == want).all()))
        _ = np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(run(*args)[0, 0, 0])
        per = max(time.perf_counter() - t0, 1e-4)
        iters = max(int(dur / per), 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = run(*args)
        _ = np.asarray(o[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{mode:10s} {dt*1e3:8.2f} ms/call  ({cells/dt/1e9:7.1f} GCUPS-equiv)")


if __name__ == "__main__":
    main()
