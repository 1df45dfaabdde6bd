"""Attribute unrolled-Myers kernel time: full vs stubbed variants.

Copies the round-5 unrolled-words kernel body with parts stubbed (results
are WRONG for stubs — timing only) to locate the remaining per-step cost at
the bench shape. Pair with the op-count ceiling note in BENCH_NOTES.md.

Usage: python benches/myers_unrolled_ablate.py [duration_s]
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

from stringzilla_tpu.ops.myers_pallas import _uless  # noqa: E402

QPACK, LANES, WORDS, CAND_LEN, ALPHA = 8, 1024, 4, 128, 32
ROWS = WORDS * 32
PR = WORDS * 4 * QPACK


def kernel(mode, refs):
    p_ref, qlen_ref, cands_ref, clens_ref, acol_ref, out_ref = refs
    words, qpack = WORDS, QPACK
    clens = clens_ref[...]
    lanes = clens.shape[1]

    grp_iota = jax.lax.broadcasted_iota(jnp.int32, (qpack, lanes), 0)
    m_grp = jnp.zeros((qpack, lanes), jnp.int32)
    for k in range(qpack):
        m_grp = jnp.where(grp_iota == k, qlen_ref[0, k, 0], m_grp)
    VP0 = []
    for w in range(words):
        in_word = jnp.clip(m_grp - w * 32, 0, 32)
        VP0.append(jnp.where(in_word >= 32, jnp.int32(-1),
                             jnp.left_shift(jnp.int32(1), in_word) - 1))
    VP0 = tuple(VP0)
    VN0 = tuple(jnp.zeros((qpack, lanes), jnp.int32) for _ in range(words))
    P = p_ref[0]
    alpha_col = acol_ref[...]

    def build_eq(j):
        jc = jnp.minimum(j - 1, CAND_LEN - 1)
        c_row = cands_ref[pl.ds(jc, 1), :]
        if mode.endswith("split16"):
            # P here is (2*words*2*qpack, ALPHA): 16-bit halves split into
            # two exact bf16 terms (hi 8 bits pre-shifted, lo 8 bits),
            # stacked along the K axis with a duplicated one-hot so ONE
            # single-pass matmul accumulates them exactly in f32.
            ohc = (alpha_col == c_row).astype(jnp.bfloat16)
            ohc2 = jnp.concatenate([ohc, ohc], axis=0)  # (2*ALPHA, lanes)
            p2 = jax.lax.dot_general(P, ohc2, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.int32)  # (2*words*qpack, ·)
            return tuple(p2[w * 2 * qpack:w * 2 * qpack + qpack]
                         | (p2[w * 2 * qpack + qpack:(w + 1) * 2 * qpack] << 16)
                         for w in range(words))
        ohc = (alpha_col == c_row).astype(jnp.bfloat16)
        p4 = jax.lax.dot_general(P, ohc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)
        return tuple(p4[w * 4 * qpack:w * 4 * qpack + qpack]
                     | (p4[w * 4 * qpack + qpack:w * 4 * qpack + 2 * qpack] << 8)
                     | (p4[w * 4 * qpack + 2 * qpack:w * 4 * qpack + 3 * qpack] << 16)
                     | (p4[w * 4 * qpack + 3 * qpack:w * 4 * qpack + 4 * qpack] << 24)
                     for w in range(words))

    def step(j, carry):
        VP, VN, Eq = carry
        if mode == "eq_only":
            Eq_next = build_eq(j + 1)
            VP = tuple(VP[w] ^ Eq[w] for w in range(words))  # consume Eq
            return VP, VN, Eq_next
        Eq_next = Eq if mode == "no_eq" else build_eq(j + 1)

        Xv = [Eq[w] | VN[w] for w in range(words)]
        t = [Eq[w] & VP[w] for w in range(words)]
        s1 = [t[w] + VP[w] for w in range(words)]
        s = [s1[0]]
        if mode == "no_carry":
            s = s1
        elif words > 1:
            c = _uless(s1[0], t[0]).astype(jnp.int32)
            for w in range(1, words):
                s.append(s1[w] + c)
                if w < words - 1:
                    g = _uless(s1[w], t[w]).astype(jnp.int32)
                    p = (s1[w] == -1)
                    c = g | jnp.where(p, c, 0)
        Xh = [(s[w] ^ VP[w]) | Eq[w] for w in range(words)]
        Ph = [VN[w] | ~(Xh[w] | VP[w]) for w in range(words)]
        Mh = [VP[w] & Xh[w] for w in range(words)]
        if mode == "no_shift":
            PhS, MhS = Ph, Mh
        else:
            PhS = [(Ph[0] << 1) | 1]
            MhS = [Mh[0] << 1]
            for w in range(1, words):
                PhS.append((Ph[w] << 1) | ((Ph[w - 1] >> 31) & 1))
                MhS.append((Mh[w] << 1) | ((Mh[w - 1] >> 31) & 1))
        if mode == "no_freeze":
            VPn = tuple(MhS[w] | ~(Xv[w] | PhS[w]) for w in range(words))
            VNn = tuple(PhS[w] & Xv[w] for w in range(words))
        else:
            live = j <= clens
            VPn = tuple(jnp.where(live, MhS[w] | ~(Xv[w] | PhS[w]), VP[w])
                        for w in range(words))
            VNn = tuple(jnp.where(live, PhS[w] & Xv[w], VN[w])
                        for w in range(words))
        return VPn, VNn, Eq_next

    VPf, VNf, _ = jax.lax.fori_loop(1, CAND_LEN + 1, step,
                                    (VP0, VN0, build_eq(1)))

    def popcnt(v):
        v = v - ((v >> 1) & 0x55555555)
        v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
        v = (v + (v >> 4)) & 0x0F0F0F0F
        return (v * 0x01010101) >> 24

    delta = jnp.zeros((qpack, lanes), jnp.int32)
    for w in range(words):
        delta += popcnt(VPf[w] & VP0[w]) - popcnt(VNf[w] & VP0[w])
    out_ref[0] = jnp.broadcast_to(clens, (qpack, lanes)) + delta


def build(mode, n_qblocks, n_cands):
    grid = (n_qblocks, n_cands // LANES)
    split16 = mode.endswith("split16")
    pr = 2 * WORDS * QPACK if split16 else PR
    ka = 2 * ALPHA if split16 else ALPHA
    in_specs = [
        pl.BlockSpec((1, pr, ka), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, QPACK, 1), lambda qi, cb: (qi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((CAND_LEN, LANES), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda qi, cb: (0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ALPHA, 1), lambda qi, cb: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    pieces = 2 if split16 else 4
    bits = 32 // pieces
    oi = np.arange(WORDS * pieces * QPACK)[:, None]
    ri = np.arange(QPACK * ROWS)[None, :]
    o_w, o_rem = oi // (pieces * QPACK), oi % (pieces * QPACK)
    o_piece, o_grp = o_rem // QPACK, o_rem % QPACK
    rel = (ri % ROWS) - o_w * 32 - o_piece * bits
    S_np = np.where((o_grp == ri // ROWS) & (rel >= 0) & (rel < bits),
                    (1 << np.clip(rel, 0, bits - 1)).astype(np.int64), 0)
    S = jnp.asarray(S_np.astype(np.float32)).astype(jnp.bfloat16)

    def wrapped(queries_3d, qlens_3d, cands_t, clens, arow, acol):
        q1 = (queries_3d == arow[None]).astype(jnp.bfloat16)
        P = jax.lax.dot_general(S, q1, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        P = jnp.transpose(P, (1, 0, 2))
        if split16:
            # exact error-free split: hi = top 8 bits pre-shifted, lo = low 8
            hi = jnp.floor(P / 256.0) * 256.0
            lo = P - hi
            P = jnp.concatenate([hi, lo], axis=2)  # K-axis stack
        P = P.astype(jnp.bfloat16)
        return pl.pallas_call(
            lambda *refs: kernel(mode, refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, QPACK, LANES),
                                   lambda qi, cb: (qi, 0, cb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_qblocks, QPACK, n_cands),
                                           jnp.int32),
        )(P, qlens_3d, cands_t, clens, acol)

    return jax.jit(wrapped)


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
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
    for mode in ("full", "full_split16", "no_eq", "eq_only", "no_carry",
                 "no_shift", "no_freeze", "full"):
        run = build(mode, n_qblocks, n_cands)
        if mode.startswith("full"):
            got = np.asarray(run(*args))
            if want is None:
                want = got
            else:
                print(f"{mode} exact:", bool((got == want).all()))
        _ = np.asarray(run(*args)[0, 0, 0])
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
