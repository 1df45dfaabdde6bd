"""Anti-diagonal wavefront DP for ONE long pair — the ``diagonal_walker`` tier.

The lane-packed kernels (``similarity_pallas``, ``myers_pallas``) parallelize
ACROSS pairs; a single megabyte-scale pair would use one lane. The reference
solves this with its intra-pair tier: ``diagonal_walker`` sweeps
anti-diagonals, whose cells are mutually independent (reference
``similarities/serial.hpp:533-546,1387``; the ``cross_in_parallel_`` scheduler
routes any pair with ``min(len) > L1`` to it, ``serial.hpp:3334-3345``).

TPU design: diagonal ``d`` holds cells ``(i, d-i)``; the diagonal is laid out
FLAT over a ``(rows, 128)`` tile (cell ``i`` at ``[i//128, i%128]``), so every
step is dense VPU work over the whole diagonal:

* three rotating diagonals (linear gaps): ``D[d][i]`` needs ``D[d-1][i]``,
  ``D[d-1][i-1]`` (one flat shift — the same roll+row-select trick as
  ``find_pallas._shifted``), and ``D[d-2][i-1]`` + substitution;
* the second operand streams through a shift register: ``T[i] = b[d-1-i]``
  advances by one flat shift + head insert per step, so the substitution
  compare ``q[i-1] == b[d-i-1]`` is elementwise;
* boundaries (``D[d][0]``, ``D[d][d]``) and out-of-range lanes are masked
  with flat iotas; the local variant clamps at 0 and max-tracks.

Uniform substitution costs + linear gaps (the Levenshtein / uniform-NW/SW
family); memory is O(diagonal), so one chip handles pairs up to ~500 K chars
(3 diagonals + shift register in VMEM). Cross-chip ring decomposition via
``ppermute`` frontier exchange is the planned extension (the reference's GPU
``row_frontier`` pattern, ``cuda.cuh:708-749``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform

__all__ = ["wavefront_score", "wavefront_score_mim",
           "levenshtein_long_pair", "MAX_FLAT_CELLS"]

LANES = 128
BIG = 1 << 28
MAX_FLAT_CELLS = 1 << 19  # diagonal cells per chip (VMEM budget)


def _flat_shift_down(X: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """``out[flat i] = X[flat i-1]`` over the row-major (rows, 128) layout;
    position 0 receives X's junk (callers mask it)."""
    rows = X.shape[0]
    Z = jnp.roll(X, 1, axis=1) if interpret else pltpu.roll(X, 1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    Zup = jnp.concatenate([Z[:1], Z[:-1]], axis=0)  # row r-1's rolled copy
    return jnp.where(col == 0, Zup, Z)


def _kernel(objective: str, locality: str, rows: int, use_classes: bool,
            is_affine: bool, interpret: bool, refs):
    if use_classes:
        a_ref, b_ref, mn_ref, costs_ref, planes_ref, out_ref = refs
    else:
        a_ref, b_ref, mn_ref, costs_ref, out_ref = refs
        planes_ref = None
    m = mn_ref[0, 0]
    n = mn_ref[0, 1]
    match = costs_ref[0, 0]
    mismatch = costs_ref[0, 1]
    gap = costs_ref[0, 2]  # linear gap, or affine OPEN when is_affine
    extend = costs_ref[0, 3]

    is_min = objective == "min"
    is_local = locality == "local"
    ident = jnp.int32(BIG if is_min else -BIG)
    opt = jnp.minimum if is_min else jnp.maximum

    shape = (rows, LANES)
    flat = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))

    def boundary(d):
        if is_local:
            return jnp.int32(0)
        if is_affine:
            # a k-gap costs open + extend*(k-1) (reference serial.hpp:77-88)
            return jnp.where(d > 0, gap + extend * (d - 1), 0)
        return gap * d

    def boundary_gap(d):
        # gap-matrix boundary: primary + open + extend (magnitude-padded
        # discard, reference serial.hpp:1139-1146)
        return boundary(d) + gap + extend

    # qm1[i] = a[i-1]; row 0 unused (masked)
    qm1 = _flat_shift_down(a_ref[...], interpret)

    if use_classes:
        # Bit-sliced 32x32 substitution table (biased +128 host-side): the
        # query's class is fixed per cell, so the 8 per-bit row masks
        # RM_b[i] = bitplane_b[q_class[i]] are selected ONCE (32 selects per
        # plane); each step then costs one variable shift + mask per bit:
        # cost = sum_b ((RM_b >> c_class) & 1) << b - 128.
        qc = jnp.clip(qm1, 0, 31)
        row_masks = []
        for bnum in range(8):
            rm = jnp.zeros(shape, jnp.int32)
            for cls in range(32):
                rm = jnp.where(qc == cls, planes_ref[bnum, cls], rm)
            row_masks.append(rm)

    # D2 = diag 0 (cell (0,0) = 0), D1 = diag 1 (cells (0,1),(1,0) = boundary)
    D2 = jnp.where(flat == 0, 0, ident)
    D1 = jnp.where(flat <= 1, boundary(jnp.int32(1)), ident)
    I1 = jnp.where(flat <= 1, boundary_gap(jnp.int32(1)), ident)  # horizontal gaps
    J1 = jnp.where(flat <= 1, boundary_gap(jnp.int32(1)), ident)  # vertical gaps
    # Shift register entering step d=2: T[i] = b[d-1-i] → T[0]=b[1], T[1]=b[0]
    T0 = jnp.full(shape, -1, jnp.int32)
    T0 = jnp.where(flat == 1, b_ref[0, 0], T0)
    T0 = jnp.where(flat == 0, jnp.where(n > 1, b_ref[0, 1], jnp.int32(-1)), T0)
    best0 = jnp.zeros((1, 1), jnp.int32)

    def step(d, carry):
        D1, D2, I1, J1, T, best = carry
        # substitution for cell (i, d-i): q[i-1] vs b[d-i-1] = T[i-1]... T is
        # aligned so that T[i] = b[d-1-i]; cell i uses b[d-i-1] = T[i-1]?
        # T[i-1] = b[d-1-(i-1)] = b[d-i]. We need b[d-i-1] = T[i]. Direct.
        if use_classes:
            tc = jnp.clip(T, 0, 31)
            cost_u = jnp.zeros(shape, jnp.int32)
            for bnum in range(8):
                cost_u = cost_u | (((row_masks[bnum] >> tc) & 1) << bnum)
            sub = cost_u - 128
        else:
            sub = jnp.where(qm1 == T, match, mismatch)
        D1s = _flat_shift_down(D1, interpret)
        D2s = _flat_shift_down(D2, interpret)
        if is_affine:
            # Gotoh on diagonals: gap matrices only need diag d-1 values —
            # no within-diagonal chain (reference 7-diagonal affine walker,
            # serial.hpp:395-398, re-derived for 4 carried buffers).
            I_new = opt(D1 + gap, I1 + extend)           # left neighbor (i)
            J1s = _flat_shift_down(J1, interpret)
            J_new = opt(D1s + gap, J1s + extend)         # up neighbor (i-1)
            cand = opt(D2s + sub, opt(I_new, J_new))
        else:
            I_new = J_new = None
            cand = opt(D1 + gap, D1s + gap)
            cand = opt(cand, D2s + sub)
        if is_local:
            cand = opt(cand, 0)
        # boundaries: i == 0 → D[d][0] = boundary(d) (valid while d <= n);
        # i == d (j == 0) → boundary(d) (valid while d <= m)
        at_top = flat == 0
        at_left = flat == d
        cand = jnp.where(at_top, jnp.where(d <= n, boundary(d), ident), cand)
        cand = jnp.where(at_left, jnp.where(d <= m, boundary(d), ident), cand)
        # out-of-range cells: i > min(d, m) or i < d - n
        valid = (flat <= jnp.minimum(d, m)) & (flat >= jnp.maximum(d - n, 0))
        cand = jnp.where(valid, cand, ident)
        if is_affine:
            I_new = jnp.where(at_top | at_left, boundary_gap(d), I_new)
            J_new = jnp.where(at_top | at_left, boundary_gap(d), J_new)
            I_new = jnp.where(valid, I_new, ident)
            J_new = jnp.where(valid, J_new, ident)
        if is_local:
            vmask = valid & (flat >= 1) & (flat <= m) & (d - flat >= 1)
            masked = jnp.where(vmask, cand, ident)
            red = jnp.min(masked) if is_min else jnp.max(masked)
            best = opt(best, red.reshape(1, 1))
        # advance the b shift register: T'[i] = b[d-i] = Tshift; T'[0] = b[d].
        # Scalar VMEM loads need lane alignment → load the whole row and
        # reduce out the wanted lane.
        Ts = _flat_shift_down(T, interpret)
        row = b_ref[pl.ds(jnp.minimum(d // LANES, rows - 1), 1), :]  # (1, 128)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        bd = jnp.sum(jnp.where(lane_iota == d % LANES, row, 0))
        bd = jnp.where(d < n, bd, jnp.int32(-1))
        T = jnp.where(flat == 0, bd, Ts)
        if is_affine:
            return cand, D1, I_new, J_new, T, best
        return cand, D1, I1, J1, T, best

    D1, D2, I1, J1, T, best = jax.lax.fori_loop(
        2, m + n + 1, step, (D1, D2, I1, J1, T0, best0))
    if is_local:
        out_ref[0, 0] = best[0, 0]
    else:
        # D[m+n][m] lives at flat index m of the final diagonal (callers
        # guarantee m, n >= 1 so the loop ran at least once)
        out_ref[0, 0] = jnp.sum(jnp.where(flat == m, D1, 0))


@functools.lru_cache(maxsize=64)
def _build(objective: str, locality: str, rows: int, use_classes: bool,
           is_affine: bool, interpret: bool):
    kernel = functools.partial(_kernel, objective, locality, rows, use_classes,
                               is_affine, interpret)
    in_specs = [
        pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    if use_classes:
        in_specs.append(pl.BlockSpec((8, 32), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))

    def wrapped(*args):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=interpret,
        )(*args)

    return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# Staged meet-in-the-middle tier (uniform costs, linear gaps, global)
# ---------------------------------------------------------------------------
#
# The flat kernel above sizes its tile for the LONGEST diagonal and pays that
# width on every step — ~2× waste on a square pair (the diagonal grows from 1
# to m and shrinks back). This tier recovers it two ways (reference analog:
# the CUDA warp-tile kernel walks only live tile-columns, cuda.cuh:708-749):
#
# * **meet in the middle**: a forward sweep of (a, b) to the middle
#   anti-diagonal d* and a forward sweep of (reverse a, reverse b) to
#   (m+n-d*) — both sweeps only ever GROW; the distance is recovered on the
#   host from the two frontiers (including paths that JUMP the middle
#   diagonal with a substitution step, which anti-diagonal DP allows);
# * **staged tiles**: each sweep runs as a ladder of kernel launches whose
#   tile height tracks the current diagonal extent; the DP state (two
#   diagonals + the b shift register) carries between stages on device,
#   padded with identities.


def _stage_kernel(rows: int, rows_b: int, first: bool, interpret, refs):
    """One ladder stage of the uniform-linear-global wavefront: run steps
    ``d ∈ [d0, d1)`` carrying (D1, D2, T) in/out. After the loop
    ``D1 = D[d1-1]``, ``D2 = D[d1-2]``."""
    if first:
        a_ref, b_ref, sm_ref, o1_ref, o2_ref, ot_ref = refs
        i1_ref = i2_ref = it_ref = None
    else:
        a_ref, b_ref, sm_ref, i1_ref, i2_ref, it_ref, o1_ref, o2_ref, ot_ref = refs
    m = sm_ref[0, 0]
    n = sm_ref[0, 1]
    d0 = sm_ref[0, 2]
    d1 = sm_ref[0, 3]
    match = sm_ref[0, 4]
    mismatch = sm_ref[0, 5]
    gap = sm_ref[0, 6]

    shape = (rows, LANES)
    flat = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    ident = jnp.int32(BIG)
    qm1 = _flat_shift_down(a_ref[...], interpret)

    if first:
        D2 = jnp.where(flat == 0, 0, ident)
        D1 = jnp.where(flat <= 1, gap, ident)
        T = jnp.full(shape, -1, jnp.int32)
        T = jnp.where(flat == 1, b_ref[0, 0], T)
        T = jnp.where(flat == 0, jnp.where(n > 1, b_ref[0, 1], jnp.int32(-1)), T)
    else:
        D1, D2, T = i1_ref[...], i2_ref[...], it_ref[...]

    def step(d, carry):
        D1, D2, T = carry
        sub = jnp.where(qm1 == T, match, mismatch)
        D1s = _flat_shift_down(D1, interpret)
        D2s = _flat_shift_down(D2, interpret)
        cand = jnp.minimum(D1 + gap, D1s + gap)
        cand = jnp.minimum(cand, D2s + sub)
        cand = jnp.where(flat == 0, jnp.where(d <= n, gap * d, ident), cand)
        cand = jnp.where(flat == d, jnp.where(d <= m, gap * d, ident), cand)
        valid = (flat <= jnp.minimum(d, m)) & (flat >= jnp.maximum(d - n, 0))
        cand = jnp.where(valid, cand, ident)
        Ts = _flat_shift_down(T, interpret)
        row = b_ref[pl.ds(jnp.minimum(d // LANES, rows_b - 1), 1), :]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        bd = jnp.sum(jnp.where(lane_iota == d % LANES, row, 0))
        bd = jnp.where(d < n, bd, jnp.int32(-1))
        T = jnp.where(flat == 0, bd, Ts)
        return cand, D1, T

    D1, D2, T = jax.lax.fori_loop(d0, d1, step, (D1, D2, T))
    o1_ref[...] = D1
    o2_ref[...] = D2
    ot_ref[...] = T


@functools.lru_cache(maxsize=64)
def _build_stage(rows: int, rows_b: int, first: bool, interpret: bool):
    kernel = functools.partial(_stage_kernel, rows, rows_b, first, interpret)
    in_specs = [
        pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_b, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    if not first:
        in_specs += [pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 3

    def wrapped(*args):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=(1,),
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
                            for _ in range(3)),
            out_shape=tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
                            for _ in range(3)),
            interpret=interpret,
        )(*args)

    return jax.jit(wrapped)


def _sweep_frontier(a: np.ndarray, b: np.ndarray, m: int, n: int, d_end: int,
                    match: int, mismatch: int, gap: int, n_stages: int = 4):
    """Forward staged sweep to diagonal ``d_end``; returns
    ``(D[d_end], D[d_end-1])`` as flat numpy arrays of length m+1."""
    interp = platform.pallas_interpret()
    rows_b = max(-(-max(n, 1) // LANES), 1)
    b_pad = np.full(rows_b * LANES, -2, np.int32)
    b_pad[:n] = b
    b2 = jnp.asarray(b_pad.reshape(rows_b, LANES))

    # ladder: stage s ends at d_s; tile must hold flat ≤ min(d_s - 1, m)
    bounds = [2 + ((d_end - 1) * (s + 1)) // n_stages for s in range(n_stages)]
    carry = None
    d_prev = 2
    for s, d_s in enumerate(bounds):
        if s and d_s <= d_prev:
            continue
        ext = min(d_s - 1, m) + 1
        rows = -(-max(-(-ext // LANES), 8) // 8) * 8
        a_pad = np.full(rows * LANES, -2, np.int32)
        seg = a[: min(m, rows * LANES)]
        a_pad[: len(seg)] = seg
        a2 = jnp.asarray(a_pad.reshape(rows, LANES))
        sm = jnp.asarray(np.array(
            [[m, n, d_prev, d_s, match, mismatch, gap, 0]], np.int32))
        call = _build_stage(rows, rows_b, carry is None, interp)
        if carry is None:
            carry = call(a2, b2, sm)
        else:
            D1, D2, T = carry
            grow = rows - D1.shape[0]
            if grow > 0:
                padD = jnp.full((grow, LANES), BIG, jnp.int32)
                padT = jnp.full((grow, LANES), -1, jnp.int32)
                D1 = jnp.concatenate([D1, padD], axis=0)
                D2 = jnp.concatenate([D2, padD], axis=0)
                T = jnp.concatenate([T, padT], axis=0)
            carry = call(a2, b2, sm, D1, D2, T)
        d_prev = d_s
    D1, D2, _ = carry
    f1 = np.asarray(D1).reshape(-1)[: m + 1]
    f2 = np.asarray(D2).reshape(-1)[: m + 1]
    return f1, f2


def wavefront_score_mim(a: np.ndarray, b: np.ndarray, match: int = 0,
                        mismatch: int = 1, gap: int = 1,
                        n_stages: int = 4) -> int:
    """Global min-cost alignment score of one long pair — staged
    meet-in-the-middle wavefront (uniform substitution costs, linear gaps).
    Exact: equals the full-sweep kernel / Wagner-Fischer.

    Perf note (v5e, tunneled): the ladder saves ~40% of padded cells but
    pays per-stage launch + frontier-pull overhead — measured crossover vs
    ``wavefront_score`` is ≈150K chars (180K×180K: 45.8 vs 42.5 GCUPS), so
    this stays a non-default tier; the flat kernel remains the router's
    choice below that."""
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return (m + n) * gap
    d_star = (m + n) // 2
    if d_star < 2 or (m + n) - d_star < 2:
        return wavefront_score(a, b, match, mismatch, gap)
    # forward frontier at d*, backward (reversed inputs) at m+n-d*
    F1, F0 = _sweep_frontier(a, b, m, n, d_star, match, mismatch, gap,
                             n_stages)
    B1, B0 = _sweep_frontier(a[::-1], b[::-1], m, n, (m + n) - d_star,
                             match, mismatch, gap, n_stages)
    i = np.arange(m + 1)
    # paths touching diagonal d*: F[d*][i] + B[m+n-d*][m-i] (same cell, its
    # cost counted once in each frontier... the cell value appears in both
    # sums, so subtract nothing — frontiers are PATH COSTS to/from the cell)
    big = np.int64(BIG)
    f1 = F1.astype(np.int64)
    b1 = B1[::-1].astype(np.int64)  # b1[i] = B[m+n-d*][m-i]
    through = np.where((f1 < big) & (b1 < big), f1 + b1, 2 * big)
    total = int(through.min())
    # paths JUMPING d*-1 → d*+1 with one substitution/match step:
    # F[d*-1][i] + sub(a[i], b[d*-1-i]) + B[m+n-d*-1][m-i-1]
    f0 = F0.astype(np.int64)  # F[d*-1]
    # the jump lands one diagonal past the middle: B[d2-1] is the backward
    # sweep's second frontier (its D2)
    b0 = np.full(m + 1, 2 * big, np.int64)
    # b0[i] = B[d2-1][m-i-1] for i in [0, m)
    b0[:m] = B0[::-1][1:].astype(np.int64)
    j = d_star - 1 - i  # b index of the jumped cell's column, 0-based char b[j]
    ok = (i >= 0) & (i < m) & (j >= 0) & (j < n)
    sub = np.where(ok & (a[np.clip(i, 0, m - 1)]
                         == b[np.clip(j, 0, n - 1)]), match, mismatch)
    jump = np.where(ok & (f0 < big) & (b0 < big), f0 + sub + b0, 2 * big)
    total = min(total, int(jump.min()))
    return total


def table_bitplanes(table: np.ndarray) -> np.ndarray:
    """Bit-slice a 32x32 signed cost table (biased +128) into 8 planes of
    32-bit row masks: planes[b][row] bit c = bit b of (table[row, c] + 128)."""
    t = np.asarray(table, dtype=np.int32) + 128
    if t.min() < 0 or t.max() > 255:
        raise ValueError("class costs must fit in int8")
    planes = np.zeros((8, 32), dtype=np.int64)
    for b in range(8):
        bits = (t >> b) & 1  # (32, 32)
        planes[b] = (bits << np.arange(32)[None, :]).sum(axis=1)
    return (planes & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def wavefront_score(
    a: np.ndarray,  # uint8/int32 chars (or class ids when `table` given)
    b: np.ndarray,
    match: int = 0,
    mismatch: int = 1,
    gap: int = 1,
    objective: str = "min",
    locality: str = "global",
    table: np.ndarray | None = None,  # 32x32 class costs; a/b are class ids
    extend: int | None = None,  # affine: `gap` is OPEN, `extend` extends
) -> int:
    """Score ONE (possibly huge) pair with the anti-diagonal wavefront.
    Uniform substitution costs — or a 32x32 class-cost table (NW/SW style)
    with ``a``/``b`` pre-mapped to class ids. Linear gaps, or Gotoh affine
    when ``extend`` is given (k-gap costs ``gap + extend*(k-1)``)."""
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    m, n = len(a), len(b)
    is_affine = extend is not None
    if m == 0 or n == 0:
        if locality == "local":
            return 0
        k = m + n
        if is_affine:
            return gap + extend * (k - 1) if k else 0
        return k * gap
    flat = max(m + 1, n)
    if flat > MAX_FLAT_CELLS:
        raise ValueError(f"pair too long for single-chip wavefront ({flat} cells)")
    rows = max(-(-flat // LANES), 8)
    rows = -(-rows // 8) * 8

    def pack(x):
        buf = np.full(rows * LANES, -2, dtype=np.int32)  # -2 ≠ pad of T (-1)
        buf[: len(x)] = x
        return buf.reshape(rows, LANES)

    mn = np.array([[m, n]], dtype=np.int32)
    costs = np.array([[match, mismatch, gap,
                       extend if is_affine else 0]], dtype=np.int32)
    use_classes = table is not None
    call = _build(objective, locality, rows, use_classes, is_affine,
                  platform.pallas_interpret())
    args = [jnp.asarray(pack(a)), jnp.asarray(pack(b)),
            jnp.asarray(mn), jnp.asarray(costs)]
    if use_classes:
        args.append(jnp.asarray(table_bitplanes(table).reshape(8, 32)))
    out = call(*args)
    return int(out[0, 0])


# ---------------------------------------------------------------------------
# Banded tier (unit costs, global, min) — Ukkonen band doubling
# ---------------------------------------------------------------------------
#
# The flat kernel pays the FULL longest-diagonal tile on every step; when the
# true distance d is small (near-duplicate long pairs — the dominant real
# workload for 100K+ pairs), every optimal path stays inside the band
# |i-j| <= d, so a band of half-width k >= d suffices and is EXACT by
# Ukkonen's lemma: any path leaving the band costs > k unit gaps, so if the
# banded result is <= k it equals the unbanded distance. The wrapper doubles
# k until that check passes (geometric total <= 2x the final band's work).
#
# Band coordinates: on diagonal d, live cells i ∈ [lo(d), lo(d)+2k+1) with
# lo(d) = max(0, ceil((d-k)/2)); cell i sits at band index u = i - lo(d).
# lo advances by 0/1 per step, so neighbor reads become +-1 flat shifts
# selected by the per-step delta — the same roll+row-fix shifts as the flat
# kernel, on a tile ~2k wide instead of ~min(m,n). The a/b operands stay
# full-size in VMEM for the streaming registers' dynamic row loads (the
# proven `b_ref[pl.ds(d // LANES)]` pattern); the DP state shrinks from
# O(min(m,n)) to O(k).
#
# Reference analog: banded Levenshtein with early exit is the classic
# sz_levenshtein_distance bounded mode (reference `similarities/serial.hpp`
# bound parameter); the reference does not ship band *doubling* — this tier
# composes it with the TPU wavefront to make exact long-pair distances cheap
# when pairs are similar.


def _flat_shift_up(X: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """``out[flat i] = X[flat i+1]`` over the row-major (rows, 128) layout;
    the last position receives junk (callers mask it)."""
    # pltpu.roll requires a non-negative shift: -1 ≡ LANES-1 (mod LANES)
    Z = (jnp.roll(X, -1, axis=1) if interpret
         else pltpu.roll(X, LANES - 1, axis=1))
    col = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    Zdn = jnp.concatenate([Z[1:], Z[-1:]], axis=0)  # row r+1's rolled copy
    return jnp.where(col == LANES - 1, Zdn, Z)


def _band_kernel(rows: int, rows_full: int, interpret: bool,
                 check_every: int, refs):
    """One launch runs the WHOLE doubling ladder: the half-width k is a
    runtime SMEM scalar, rung state lives in a fixed (rows, 128) tile sized
    for kmax, and each rung aborts early once the band minimum exceeds its
    k. The abort step also prices the next rung: frontier minima grow
    roughly linearly in walked diagonals for scattered-edit pairs, so
    k * tmax / t_abort estimates the true distance and the ladder jumps
    straight to the rung that will certify it. One device call — and one
    tunnel round-trip — replaces a host-synchronized rung sequence."""
    ab_ref, q0_ref, t0_ref, mn_ref, out_ref = refs
    m = mn_ref[0, 0]
    n = mn_ref[0, 1]
    k0 = mn_ref[0, 2]
    kmax = mn_ref[0, 3]
    ident = jnp.int32(BIG)
    shape = (rows, LANES)
    U = rows * LANES
    flat = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    ce = max(check_every, 1)
    tmax = (m + n - 1 + 3) // 4
    tmac = (tmax + ce - 1) // ce

    def walk(k):
        """Run the banded wavefront at half-width k until done or the band
        minimum proves the distance exceeds k. Returns (banded result at
        the final cell, final band minimum, macro-steps walked)."""

        def lo_of(d):
            return jnp.maximum(0, (d - k + 1) // 2)

        def step(d, carry):
            D1, D2, T, Q = carry
            lo = lo_of(d)
            d1 = lo - lo_of(d - 1)  # 0/1
            d2 = lo - lo_of(d - 2)  # 0/1
            # neighbors in band coords: D[d-1][i] = D1[u + d1],
            # D[d-1][i-1] = D1[u + d1 - 1], D[d-2][i-1] = D2[u + d2 - 1]
            D1u = _flat_shift_up(D1, interpret)
            D1d = _flat_shift_down(D1, interpret)
            D2d = _flat_shift_down(D2, interpret)
            up_edge = flat == U - 1   # shift-up feeds junk here
            dn_edge = flat == 0       # shift-down feeds junk here
            nb_same = jnp.where(d1 == 0, D1, jnp.where(up_edge, ident, D1u))
            nb_diag = jnp.where(d1 == 0, jnp.where(dn_edge, ident, D1d), D1)
            nb_sub = jnp.where(d2 == 0, jnp.where(dn_edge, ident, D2d), D2)
            sub = jnp.where(Q == T, 0, 1)
            cand = jnp.minimum(jnp.minimum(nb_same, nb_diag) + 1,
                               nb_sub + sub)
            i = flat + lo
            cand = jnp.where((i == 0) & (d <= n), d, cand)
            cand = jnp.where((i == d) & (d <= m), d, cand)
            j = d - i
            valid = ((i <= jnp.minimum(d, m)) & (i >= jnp.maximum(d - n, 0))
                     & (jnp.abs(i - j) <= k))
            cand = jnp.where(valid, cand, ident)
            # advance the streaming registers to d+1's coordinates. Exactly
            # ONE new scalar enters the band per step — an `a` char when the
            # band head advances (dn=1, feeds Q's tail u=U-1), else a `b`
            # char (dn=0, feeds T's head u=0). One dynamic row load from the
            # stacked a|b operand + a dynamic lane roll place it at the
            # consuming position; the old per-step path paid TWO row loads
            # and TWO ~7-op lane reduces on this serial chain.
            lo1 = lo_of(d + 1)
            is_a = (lo1 - lo) == 1  # dn
            idx = jnp.where(is_a, lo1 - 2 + U, d - lo1)
            limit = jnp.where(is_a, m, n)
            fill = jnp.where(is_a, jnp.int32(-2), jnp.int32(-1))
            rowi = jnp.clip(idx // LANES, 0, rows_full - 1) \
                + jnp.where(is_a, 0, rows_full)
            row = ab_ref[pl.ds(rowi, 1), :]
            # roll so x[idx % LANES] lands at the consuming lane (127 for
            # Q's tail, 0 for T's head); out[j] = x[(j - shift) % LANES]
            target = jnp.where(is_a, jnp.int32(LANES - 1), jnp.int32(0))
            shift = (target - idx) % LANES
            row = (jnp.roll(row, shift, axis=1) if interpret
                   else pltpu.roll(row, shift, axis=1))
            v = jnp.where((idx >= 0) & (idx < limit), row, fill)
            V = jnp.broadcast_to(v, shape)
            # T'[u] = b[d-u-lo(d+1)]: dn=1 -> unchanged; dn=0 -> shift down
            Ts = _flat_shift_down(T, interpret)
            T = jnp.where(is_a, T, jnp.where(flat == 0, V, Ts))
            # Q'[u] = a[u+lo(d+1)-1]: dn=0 -> unchanged; dn=1 -> shift up
            Qs = _flat_shift_up(Q, interpret)
            Q = jnp.where(is_a, jnp.where(flat == U - 1, V, Qs), Q)
            return cand, D1, T, Q

        # manual 4x unroll (dynamic bounds forbid fori_loop's unroll=):
        # each sub-step is gated so overshoot beyond d = m+n is a no-op
        def step4(t, carry):
            for j in range(4):
                d = 2 + t * 4 + j
                new = step(d, carry)
                keep = d <= m + n
                carry = tuple(jnp.where(keep, nv, ov)
                              for nv, ov in zip(new, carry))
            return carry

        def macro(t, carry):
            for i in range(ce):
                carry = step4(t * ce + i, carry)
            return carry

        # Early exit: every new frontier value is >= the min over the two
        # previous frontiers (unit costs), so once min(D1, D2) exceeds k
        # the final distance provably exceeds k. The reduce rides the
        # while_loop condition, checked once per ce 4-step unrolls to stay
        # off the serial chain.
        def cond(carry):
            t, D1, D2, T, Q, bmin = carry
            return (t < tmac) & (bmin <= k)

        def body(carry):
            t, D1, D2, T, Q, bmin = carry
            D1, D2, T, Q = macro(t, (D1, D2, T, Q))
            return (t + 1, D1, D2, T, Q,
                    jnp.minimum(jnp.min(D1), jnp.min(D2)))

        # entering d=2: lo(2)=0 (k >= 2), so band coords == flat coords
        D2 = jnp.where(flat == 0, 0, ident)
        D1 = jnp.where(flat <= 1, 1, ident)
        t, D1, D2, T, Q, bmin = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), D1, D2, t0_ref[...], q0_ref[...], jnp.int32(0)))
        # D[m+n][m] sits at band index m - lo(m+n)
        u_fin = m - lo_of(m + n)
        res = jnp.sum(jnp.where(flat == u_fin, D1, 0))
        return res, bmin, t

    def pow2ceil_from(base, lo):
        return jax.lax.while_loop(lambda p: p < lo, lambda p: p * 2, base)

    def rung_cond(carry):
        k, res, status = carry
        return status == 0

    def rung_body(carry):
        k, _, _ = carry
        res, bmin, t = walk(k)
        aborted = bmin > k
        ok = (~aborted) & (res <= k)
        # abort -> abort-step estimate (+25% headroom); completed-but-over
        # -> res is a true upper bound (restricting paths only over-counts)
        est_abort = k * tmac // jnp.maximum(t, 1)
        est = jnp.where(aborted, est_abort + est_abort // 4, res)
        knext = jnp.minimum(pow2ceil_from(2 * k, jnp.minimum(est, kmax)),
                            kmax)
        status = jnp.where(ok, 1, jnp.where(k >= kmax, 2, 0))
        return (jnp.where(status == 0, knext, k),
                jnp.where(ok, res, jnp.int32(0)), status)

    _, res_f, status_f = jax.lax.while_loop(
        rung_cond, rung_body, (k0, jnp.int32(0), jnp.int32(0)))
    out_ref[0, 0] = res_f
    out_ref[0, 1] = status_f  # 1 = certified; 2 = distance > kmax


@functools.lru_cache(maxsize=64)
def _build_band(rows: int, rows_full: int, interpret: bool,
                check_every: int = 16):
    kernel = functools.partial(_band_kernel, rows, rows_full, interpret,
                               check_every)
    in_specs = [
        pl.BlockSpec((2 * rows_full, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]

    def wrapped(*args):
        return pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            interpret=interpret,
        )(*args)

    return jax.jit(wrapped)


def levenshtein_long_pair(a: np.ndarray, b: np.ndarray,
                          k0: int = 64) -> int:
    """Exact Levenshtein distance of ONE long pair via Ukkonen band
    doubling over the anti-diagonal wavefront. The WHOLE doubling ladder
    runs inside one kernel launch (runtime-k rungs over a tile sized for
    kmax): each rung aborts as soon as the band minimum proves d > k, the
    abort step prices the jump to the certifying rung, and only one device
    round-trip is paid. Near-duplicate pairs finish in O((m+n) * d) cell
    work instead of O((m+n) * min(m,n)). Falls back to the flat full-band
    kernel when the band cannot save tile rows or d > kmax."""
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return m + n
    flat_cells = max(m + 1, n)
    rows_flat = -(-max(-(-flat_cells // LANES), 8) // 8) * 8
    rows_full = max(-(-max(m, n) // LANES), 1)

    k = max(k0, 2)
    while k < abs(m - n):  # the band must contain the final cell
        k *= 2
    # Fixed tile for every rung: per-step cost is latency-bound and nearly
    # rows-independent up to ~32 sublane rows, so size the tile for the
    # largest useful band instead of per-rung (measured in BENCH_NOTES).
    rows = min(32, ((rows_flat - 8) // 8) * 8)
    if rows < 8:
        return wavefront_score(a, b)
    U = rows * LANES
    kmax = (U - 2) // 2
    if k > kmax:
        return wavefront_score(a, b)
    ab2 = jnp.asarray(np.concatenate(
        [_pack_operand(a, rows_full), _pack_operand(b, rows_full)], axis=0))
    # streaming registers entering d=2 (lo(2)=0): Q[u]=a[u-1], T per flat
    q0 = np.full(U, -2, dtype=np.int32)
    q0[1:] = np.pad(a, (0, max(0, U - 1 - m)), constant_values=-2)[: U - 1]
    t0 = np.full(U, -1, dtype=np.int32)
    t0[0] = b[1] if n > 1 else -1
    t0[1] = b[0]
    mn = jnp.asarray(np.array([[m, n, k, kmax]], dtype=np.int32))
    call = _build_band(rows, rows_full, platform.pallas_interpret())
    out = np.asarray(call(ab2,
                          jnp.asarray(q0.reshape(rows, LANES)),
                          jnp.asarray(t0.reshape(rows, LANES)), mn))
    res, status = int(out[0, 0]), int(out[0, 1])
    if status == 1:
        return res
    return wavefront_score(a, b)  # d > kmax: banding cannot help


def _pack_operand(x: np.ndarray, rows_full: int) -> np.ndarray:
    buf = np.full(rows_full * LANES, -2, dtype=np.int32)
    buf[: len(x)] = x
    return buf.reshape(rows_full, LANES)
