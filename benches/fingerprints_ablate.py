"""Attribute fingerprint-kernel time: shipped 3-limb kernel vs stubbed and
restructured variants, to pair with the VPU op-count ceiling in BENCH_NOTES
(round-4 verdict ask #2 — "give fingerprints the Myers treatment").

Variants (stubs produce WRONG results — timing only; `limb2*` are exact and
verified against the shipped kernel in this script):

* ship         — the production 3x16-bit-limb kernel (fingerprints_pallas)
* noold        — old-term gather stubbed to the new term (kills the 8
                 per-group row loads + where + concat)      [wrong results]
* nobarrett    — Barrett reduction skipped                  [wrong results]
* nomin        — min/count tracking skipped                 [wrong results]
* limb2        — exact 2x21-bit-limb rewrite: roll products and q*m still
                 fit int32 (s0*mult <= (2^21-1)*639 ~ 1.34e9; plus
                 f0*old <= (2^21-1)*256 ~ 0.54e9 -> < 2^31; q <= 897 so
                 q*m0 <= 1.88e9) — ~1/3 fewer limb ops end to end
* limb2u8      — limb2 with the byte loop unrolled 8x (amortizes fori_loop
                 trip + scalar work; row loads stay dynamic ref loads, the
                 form Mosaic accepts)

Usage: python benches/fingerprints_ablate.py [duration_s]
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

from stringzilla_tpu.ops.fingerprints import (DEFAULT_WINDOW_WIDTHS,
                                              derive_params)  # noqa: E402


def pack_limbs(values):
    """3x16-bit limbs — the ROUND-4 production packing, kept here for the
    `ship` (old 3-limb kernel) timing reference after production moved to
    the 2-limb layout."""
    v = np.asarray(values, dtype=np.int64)
    return np.stack([
        (v & 0xFFFF).astype(np.int32),
        ((v >> 16) & 0xFFFF).astype(np.int32),
        ((v >> 32) & 0xFFFF).astype(np.int32),
    ])

DOC_LEN, N_DOCS, NDIM = 192, 4096, 256
DURATION = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0

LIMB2 = 21
MASK2 = (1 << LIMB2) - 1
SENTINEL2 = 1 << 22  # valid top limbs are < 2^21


def pack_limbs2(values):
    """(low 21 bits, the rest) — the TOP limb is open-ended (m ~ 2^42.03,
    so m1 <= 2147484, just past 2^21; products q*m1 <= 897*2147484 < 2^31
    still fit int32)."""
    v = np.asarray(values, dtype=np.int64)
    return np.stack([
        (v & MASK2).astype(np.int32),
        (v >> LIMB2).astype(np.int32),
    ])


def _kernel3(doc_len, group_sizes, mode, refs):
    """Copy of the shipped 3-limb kernel with stubbable phases."""
    (docs_ref, lens_ref, widths_ref, mult_ref, m_ref, fd_ref, inv_ref,
     hash_ref, count_ref) = refs
    dims = mult_ref.shape[0]
    lanes = docs_ref.shape[1]
    LIMB, MASK = 16, (1 << 16) - 1
    SENTINEL_HI = 1 << 20

    mult = mult_ref[...]
    m0, m1, m2 = m_ref[0], m_ref[1], m_ref[2]
    f0, f1, f2 = fd_ref[0], fd_ref[1], fd_ref[2]
    inv_m = inv_ref[...]
    lens = lens_ref[...]

    wrow = jnp.concatenate(
        [jnp.full((sz, 1), widths_ref[0, g], jnp.int32)
         for g, sz in enumerate(group_sizes)], axis=0)

    zeros = jnp.zeros((dims, lanes), jnp.int32)
    init = (zeros, zeros, zeros, zeros, zeros,
            jnp.full((dims, lanes), SENTINEL_HI, jnp.int32), zeros)

    def _row(t):
        return docs_ref[pl.ds(t, 1), :] + 1

    def step(t, carry):
        s0, s1, s2, mn0, mn1, mn2, count = carry
        term = _row(t)
        if mode == "noold":
            old_term = jnp.broadcast_to(term, (dims, lanes))
        else:
            parts = []
            for g, sz in enumerate(group_sizes):
                w = widths_ref[0, g]
                og = jnp.where(t >= w, _row(jnp.maximum(t - w, 0)), 0)
                parts.append(jnp.broadcast_to(og, (sz, lanes)))
            old_term = jnp.concatenate(parts, axis=0)

        p0 = s0 * mult + f0 * old_term + term
        p1 = s1 * mult + f1 * old_term
        p2 = s2 * mult + f2 * old_term
        c0 = p0 >> LIMB
        p0 &= MASK
        p1 += c0
        c1 = p1 >> LIMB
        p1 &= MASK
        p2 += c1
        p3 = p2 >> LIMB
        p2 &= MASK

        if mode == "nobarrett":
            s0, s1, s2 = p0, p1, p2
        else:
            xf = ((p3.astype(jnp.float32) * 65536.0 + p2.astype(jnp.float32))
                  * 65536.0 + p1.astype(jnp.float32)) * 65536.0 \
                + p0.astype(jnp.float32)
            q = jnp.floor(xf * inv_m).astype(jnp.int32)
            q = jnp.maximum(q, 0)
            r0 = p0 - q * m0
            r1 = p1 - q * m1
            r2 = p2 - q * m2
            r3 = p3
            b0 = r0 >> LIMB
            r0 = r0 & MASK
            r1 = r1 + b0
            b1 = r1 >> LIMB
            r1 = r1 & MASK
            r2 = r2 + b1
            b2 = r2 >> LIMB
            r2 = r2 & MASK
            r3 = r3 + b2

            neg = r3 < 0
            a0 = r0 + jnp.where(neg, m0, 0)
            a1 = r1 + jnp.where(neg, m1, 0)
            a2 = r2 + jnp.where(neg, m2, 0)
            c0 = a0 >> LIMB
            a0 &= MASK
            a1 += c0
            c1 = a1 >> LIMB
            a1 &= MASK
            a2 += c1
            c2 = a2 >> LIMB
            a2 &= MASK
            r0, r1, r2, r3 = a0, a1, a2, r3 + c2

            ge = (r3 > 0) | (r2 > m2) | ((r2 == m2) & ((r1 > m1) | ((r1 == m1) & (r0 >= m0))))
            s0b = r0 - jnp.where(ge, m0, 0)
            s1b = r1 - jnp.where(ge, m1, 0)
            s2b = r2 - jnp.where(ge, m2, 0)
            b0 = s0b >> LIMB
            s0b &= MASK
            s1b += b0
            b1 = s1b >> LIMB
            s1b &= MASK
            s2b += b1
            s0, s1, s2 = s0b, s1b, s2b & MASK

        if mode == "nomin":
            mn0, mn1, mn2 = mn0 ^ s0, mn1 ^ s1, mn2 ^ s2
        else:
            upd = (t >= wrow - 1) & (t < lens)
            lt = (s2 < mn2) | ((s2 == mn2) & ((s1 < mn1) | ((s1 == mn1) & (s0 < mn0))))
            eq = (s2 == mn2) & (s1 == mn1) & (s0 == mn0)
            count = jnp.where(upd & lt, 1, jnp.where(upd & eq, count + 1, count))
            take = upd & lt
            mn0 = jnp.where(take, s0, mn0)
            mn1 = jnp.where(take, s1, mn1)
            mn2 = jnp.where(take, s2, mn2)
        return s0, s1, s2, mn0, mn1, mn2, count

    s0, s1, s2, mn0, mn1, mn2, count = jax.lax.fori_loop(0, doc_len, step, init)
    skipped = mn2 >= SENTINEL_HI
    hash32 = (mn1 << 16) | mn0
    hash_ref[...] = jnp.where(skipped, jnp.int32(-1), hash32)
    count_ref[...] = jnp.where(skipped, 0, count)


def _kernel2(doc_len, group_sizes, unroll, refs):
    """Exact 2x21-bit-limb kernel; optional byte-loop unrolling."""
    (docs_ref, lens_ref, widths_ref, mult_ref, m_ref, fd_ref, inv_ref,
     hash_ref, count_ref) = refs
    dims = mult_ref.shape[0]
    lanes = docs_ref.shape[1]

    mult = mult_ref[...]
    m0, m1 = m_ref[0], m_ref[1]
    f0, f1 = fd_ref[0], fd_ref[1]
    inv_m = inv_ref[...]
    lens = lens_ref[...]

    wrow = jnp.concatenate(
        [jnp.full((sz, 1), widths_ref[0, g], jnp.int32)
         for g, sz in enumerate(group_sizes)], axis=0)
    wm1 = wrow - 1

    zeros = jnp.zeros((dims, lanes), jnp.int32)
    init = (zeros, zeros, zeros,
            jnp.full((dims, lanes), SENTINEL2, jnp.int32), zeros)

    def _row(t):
        return docs_ref[pl.ds(t, 1), :] + 1

    def body(t, carry):
        s0, s1, mn0, mn1, count = carry
        term = _row(t)
        parts = []
        for g, sz in enumerate(group_sizes):
            w = widths_ref[0, g]
            og = jnp.where(t >= w, _row(jnp.maximum(t - w, 0)), 0)
            parts.append(jnp.broadcast_to(og, (sz, lanes)))
        old_term = jnp.concatenate(parts, axis=0)

        # Fused roll: x = s*mult + fd*old + term; (low-21, rest) limbs.
        # p1 stays open-ended (< ~1.93e9 < 2^31) — no third limb needed,
        # x = p1*2^21 + p0 < 2^52 exactly recoverable in the f32 estimate.
        p0 = s0 * mult + f0 * old_term + term
        p1 = s1 * mult + f1 * old_term
        p1 += p0 >> LIMB2
        p0 &= MASK2

        # Barrett: q estimate in f32, one +m and one -m correction.
        xf = p1.astype(jnp.float32) * 2097152.0 + p0.astype(jnp.float32)
        q = jnp.maximum(jnp.floor(xf * inv_m).astype(jnp.int32), 0)
        r0 = p0 - q * m0
        r1 = p1 - q * m1
        r1 += r0 >> LIMB2
        r0 &= MASK2

        neg = r1 < 0
        a0 = r0 + jnp.where(neg, m0, 0)
        a1 = r1 + jnp.where(neg, m1, 0)
        a1 += a0 >> LIMB2
        a0 &= MASK2
        r0, r1 = a0, a1

        ge = (r1 > m1) | ((r1 == m1) & (r0 >= m0))
        s0b = r0 - jnp.where(ge, m0, 0)
        s1b = r1 - jnp.where(ge, m1, 0)
        s1b += s0b >> LIMB2
        s0b &= MASK2
        s0, s1 = s0b, s1b

        upd = (t >= wm1) & (t < lens)
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

    skipped = mn1 >= SENTINEL2
    hash32 = (mn1 << LIMB2) | mn0  # low 32 bits of the 42-bit minimum
    hash_ref[...] = jnp.where(skipped, jnp.int32(-1), hash32)
    count_ref[...] = jnp.where(skipped, 0, count)


def _kernel_hist(doc_len, group_sizes, widths_static, refs):
    """2x21-bit limbs + STATIC widths + a 32-slot register row-history:
    the steady-state body reads every group's discarded term from a rotating
    register file instead of 8 dynamic row loads + wheres, and drops the
    window-fill predicate entirely (t >= 32 > max width). The first 32 steps
    are peeled with static Python-time window-fill logic."""
    (docs_ref, lens_ref, widths_ref, mult_ref, m_ref, fd_ref, inv_ref,
     hash_ref, count_ref) = refs
    del widths_ref  # static in this variant
    dims = mult_ref.shape[0]
    lanes = docs_ref.shape[1]
    HIST = 32
    assert max(widths_static) < HIST and doc_len >= HIST

    mult = mult_ref[...]
    m0, m1 = m_ref[0], m_ref[1]
    f0, f1 = fd_ref[0], fd_ref[1]
    inv_m = inv_ref[...]
    lens = lens_ref[...]

    wrow = jnp.concatenate(
        [jnp.full((sz, 1), w, jnp.int32)
         for w, sz in zip(widths_static, group_sizes)], axis=0)
    wm1 = wrow - 1

    zeros = jnp.zeros((dims, lanes), jnp.int32)

    def _row(t):
        return docs_ref[pl.ds(t, 1), :] + 1

    def arith(s0, s1, old_term, term):
        p0 = s0 * mult + f0 * old_term + term
        p1 = s1 * mult + f1 * old_term
        p1 += p0 >> LIMB2
        p0 &= MASK2
        xf = p1.astype(jnp.float32) * 2097152.0 + p0.astype(jnp.float32)
        q = jnp.maximum(jnp.floor(xf * inv_m).astype(jnp.int32), 0)
        r0 = p0 - q * m0
        r1 = p1 - q * m1
        r1 += r0 >> LIMB2
        r0 &= MASK2
        neg = r1 < 0
        a0 = r0 + jnp.where(neg, m0, 0)
        a1 = r1 + jnp.where(neg, m1, 0)
        a1 += a0 >> LIMB2
        a0 &= MASK2
        ge = (a1 > m1) | ((a1 == m1) & (a0 >= m0))
        s0 = a0 - jnp.where(ge, m0, 0)
        s1 = a1 - jnp.where(ge, m1, 0)
        s1 += s0 >> LIMB2
        s0 &= MASK2
        return s0, s1

    def track(t, s0, s1, mn0, mn1, count, full_window):
        live = t < lens
        upd = live if full_window else ((t >= wm1) & live)
        lt = (s1 < mn1) | ((s1 == mn1) & (s0 < mn0))
        eq = (s1 == mn1) & (s0 == mn0)
        count = jnp.where(upd & lt, 1, jnp.where(upd & eq, count + 1, count))
        take = upd & lt
        return (jnp.where(take, s0, mn0), jnp.where(take, s1, mn1), count)

    # --- peel: first HIST steps, window-fill logic resolved at trace time ---
    s0, s1 = zeros, zeros
    mn0 = jnp.zeros((dims, lanes), jnp.int32)
    mn1 = jnp.full((dims, lanes), SENTINEL2, jnp.int32)
    count = zeros
    hist = [None] * HIST
    for t in range(HIST):
        term = _row(t)
        hist[t % HIST] = term
        parts = []
        for (w, sz) in zip(widths_static, group_sizes):
            og = hist[(t - w) % HIST] if t >= w else jnp.zeros((1, lanes), jnp.int32)
            parts.append(jnp.broadcast_to(og, (sz, lanes)))
        old_term = jnp.concatenate(parts, axis=0)
        s0, s1 = arith(s0, s1, old_term, term)
        mn0, mn1, count = track(t, s0, s1, mn0, mn1, count, False)

    # --- steady state: blocks of HIST with static history slots ---
    n_blocks = (doc_len - HIST) // HIST

    def block(b, carry):
        s0, s1, mn0, mn1, count, *hist = carry
        hist = list(hist)
        t0 = HIST + b * HIST
        for k in range(HIST):
            t = t0 + k
            term = _row(t)
            hist[k] = term  # (t % HIST) == k
            parts = []
            for (w, sz) in zip(widths_static, group_sizes):
                parts.append(jnp.broadcast_to(hist[(k - w) % HIST], (sz, lanes)))
            old_term = jnp.concatenate(parts, axis=0)
            s0, s1 = arith(s0, s1, old_term, term)
            mn0, mn1, count = track(t, s0, s1, mn0, mn1, count, True)
        return (s0, s1, mn0, mn1, count, *hist)

    carry = jax.lax.fori_loop(0, n_blocks, block,
                              (s0, s1, mn0, mn1, count, *hist))
    s0, s1, mn0, mn1, count = carry[:5]
    hist = list(carry[5:])

    # --- tail: plain dynamic-load body ---
    def tail_body(t, carry):
        s0, s1, mn0, mn1, count = carry
        term = _row(t)
        parts = []
        for (w, sz) in zip(widths_static, group_sizes):
            og = _row(jnp.maximum(t - w, 0))
            parts.append(jnp.broadcast_to(og, (sz, lanes)))
        old_term = jnp.concatenate(parts, axis=0)
        s0, s1 = arith(s0, s1, old_term, term)
        mn0, mn1, count = track(t, s0, s1, mn0, mn1, count, True)
        return s0, s1, mn0, mn1, count

    s0, s1, mn0, mn1, count = jax.lax.fori_loop(
        HIST + n_blocks * HIST, doc_len, tail_body,
        (s0, s1, mn0, mn1, count))

    skipped = mn1 >= SENTINEL2
    hash32 = (mn1 << LIMB2) | mn0
    hash_ref[...] = jnp.where(skipped, jnp.int32(-1), hash32)
    count_ref[...] = jnp.where(skipped, 0, count)


@functools.lru_cache(maxsize=64)
def build(mode, doc_len, group_sizes, n_docs, lane_block=128, interpret=False):
    dims = sum(group_sizes)
    n_groups = len(group_sizes)
    grid = (n_docs // lane_block,)
    spec_docs = pl.BlockSpec((doc_len, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)
    spec_lens = pl.BlockSpec((1, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)
    spec_widths = pl.BlockSpec((1, n_groups), lambda d: (0, 0), memory_space=pltpu.SMEM)
    spec_dim = pl.BlockSpec((dims, 1), lambda d: (0, 0), memory_space=pltpu.VMEM)
    n_limbs = 2 if mode.startswith("limb2") else 3
    spec_limbs = pl.BlockSpec((n_limbs, dims, 1), lambda d: (0, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((dims, lane_block), lambda d: (0, d), memory_space=pltpu.VMEM)

    if mode == "limb2hist":
        kernel = functools.partial(_kernel_hist, doc_len, group_sizes,
                                   DEFAULT_WINDOW_WIDTHS)
    elif mode.startswith("limb2"):
        unroll = {"limb2u8": 8, "limb2u4": 4}.get(mode, 1)
        kernel = functools.partial(_kernel2, doc_len, group_sizes, unroll)
    else:
        kernel = functools.partial(_kernel3, doc_len, group_sizes, mode)

    def wrapped(docs_u8, *args):
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


def timed(fn, *args):
    def pull(x):
        np.asarray(x[0].ravel()[0])

    pull(fn(*args))
    t0 = time.perf_counter()
    pull(fn(*args))
    per_call = max(time.perf_counter() - t0, 1e-5)
    iters = max(int(DURATION / per_call), 2)
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    pull(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(7)
    lens_np = rng.integers(60, DOC_LEN + 1, N_DOCS).astype(np.int32)
    docs_np = rng.integers(32, 127, (DOC_LEN, N_DOCS)).astype(np.uint8)

    widths = DEFAULT_WINDOW_WIDTHS
    params = derive_params(NDIM, widths)
    # Group-major ordering: dims sorted by width (group g = dims with
    # width widths[g]); matches the kernel's concatenated row blocks.
    order = np.argsort([list(widths).index(int(w)) for w in params["width"]],
                       kind="stable")
    group_sizes = tuple(int((params["width"] == w).sum()) for w in widths)

    mult = params["mult"][order]
    modulo = params["modulo"][order]
    fused = params["fused_disc"][order]

    docs = jnp.asarray(docs_np)
    lens = jnp.asarray(lens_np.reshape(1, -1))
    widths_a = jnp.asarray(np.array(widths, np.int32).reshape(1, -1))
    mult_a = jnp.asarray(mult.astype(np.int32).reshape(-1, 1))
    inv_a = jnp.asarray((1.0 / modulo.astype(np.float64)).astype(np.float32).reshape(-1, 1))
    m3 = jnp.asarray(pack_limbs(modulo).reshape(3, -1, 1))
    f3 = jnp.asarray(pack_limbs(fused).reshape(3, -1, 1))
    m2 = jnp.asarray(pack_limbs2(modulo).reshape(2, -1, 1))
    f2 = jnp.asarray(pack_limbs2(fused).reshape(2, -1, 1))

    total_updates = float(lens_np.sum()) * NDIM

    # Window-health probe (see verify skill): MXU chain should read >100.
    x = jnp.full((8192, 8192), 0.5, jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(20):
            x = (x @ x) * (2.0 / 8192)
        return x

    chain(x).block_until_ready()
    t0 = time.perf_counter()
    chain(x).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"probe_mxu {20 * 2 * 8192**3 / dt / 1e12:.1f} TFLOPs")

    ref_out = None
    for mode in ("ship", "noold", "nobarrett", "nomin", "limb2", "limb2u4",
                 "limb2u8", "limb2hist"):
        limbs = (m2, f2) if mode.startswith("limb2") else (m3, f3)
        fn = build(mode, DOC_LEN, group_sizes, N_DOCS)
        args = (docs, lens, widths_a, mult_a, limbs[0], limbs[1], inv_a)
        dt = timed(fn, *args)
        rate = total_updates / dt / 1e9
        print(f"{mode:10s} {dt * 1e3:8.2f} ms  {rate:8.2f} G dim-hash/s")
        out = fn(*args)
        if mode == "ship":
            ref_out = (np.asarray(out[0]), np.asarray(out[1]))
        elif mode.startswith("limb2"):
            h, c = np.asarray(out[0]), np.asarray(out[1])
            ok_h = (h == ref_out[0]).all()
            ok_c = (c == ref_out[1]).all()
            print(f"  exactness vs ship: hashes {'OK' if ok_h else 'MISMATCH'}"
                  f" counts {'OK' if ok_c else 'MISMATCH'}")
            if not (ok_h and ok_c):
                bad = np.argwhere(h != ref_out[0])[:4]
                print("  first diffs:", bad,
                      h[tuple(bad[0])] if len(bad) else "",
                      ref_out[0][tuple(bad[0])] if len(bad) else "")


if __name__ == "__main__":
    main()
