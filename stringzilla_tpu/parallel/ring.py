"""Cross-chip wavefront: ONE pair's DP matrix sharded over the mesh.

The single-chip wavefront (``ops/wavefront_pallas``) caps at what one chip's
memory holds. For longer pairs the reference's GPU tier passes tile
boundaries through a global ``row_frontier`` (reference
``similarities/cuda.cuh:708-749``); the multi-chip analog maps that frontier
exchange onto **``ppermute`` along the mesh ring**:

* the first operand's rows are split into D contiguous chunks (one per
  device); the second operand is processed in column blocks of C;
* macro-step t: device d computes tile ``(rows d, column block t-d)`` — a
  systolic pipeline, D stages deep;
* each tile consumes the bottom row of the chunk above (the frontier,
  received over ICI last step) and its own right column (kept local), and
  emits its bottom row to the next device;
* inside a tile, every column is one dense vector step over the chunk's
  rows: the within-column dependency is linearized with the same exact
  min/max prefix scan as the lane-packed kernels
  (``ops/similarity._chain_scan``).

Global alignment, uniform substitution costs, linear gaps (the Levenshtein /
uniform-NW family). Exact int32; validated against Wagner-Fischer on the
virtual multi-device CPU mesh — the same shard_map program compiles to ICI
collectives on a real pod.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_wavefront_score"]

BIG = 1 << 28


def _chain_scan(base: jnp.ndarray, gap: int, is_min: bool) -> jnp.ndarray:
    """Exact solve of ``new[i] = opt(base[i], new[i-1] + gap)`` (1-D)."""
    n = base.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    t = base - gap * iota
    ident = jnp.int32(BIG if is_min else -BIG)
    opt = jnp.minimum if is_min else jnp.maximum
    d = 1
    while d < n:
        shifted = jnp.where(iota >= d, jnp.roll(t, d), ident)
        t = opt(t, shifted)
        d *= 2
    return t + gap * iota


def _build_ring(mesh: Mesh, mb: int, C: int, NB: int, match: int,
                mismatch: int, gap: int, is_min: bool):
    D = mesh.devices.size
    opt = jnp.minimum if is_min else jnp.maximum

    def tile(a_chunk, b_block, left_col, top, corner, col_base, row_base):
        """One (mb x C) tile; returns (right_col, bottom_row, cols_matrix)."""

        def col_step(carry, inp):
            Pcol, prev_top = carry
            b_char, top_c = inp
            sub = jnp.where(a_chunk == b_char, jnp.int32(match),
                            jnp.int32(mismatch))
            diag = jnp.concatenate([prev_top[None], Pcol[:-1]])
            base = opt(Pcol + gap, diag + sub)
            base = base.at[0].set(opt(base[0], top_c + gap))
            new = _chain_scan(base, gap, is_min)
            return (new, top_c), new

        (Pcol, _), cols = jax.lax.scan(
            col_step, (left_col, corner), (b_block, top))
        # cols: (C, mb); bottom row = last element of every column
        return Pcol, cols[:, -1], cols

    def run(a_chunk, b_full, mn):
        d = jax.lax.axis_index("data")
        m, n = mn[0], mn[1]
        row_base = d * mb  # global row index of the chunk's first row - 1
        i_local = jnp.arange(mb, dtype=jnp.int32)

        left0 = gap * (row_base + 1 + i_local)  # D[i][0] boundary
        corner0 = gap * row_base  # D[row_base][0]
        state = dict(
            left=left0.astype(jnp.int32),
            corner=jnp.int32(corner0),
            frontier=jnp.zeros(C, jnp.int32),
            res_col=jnp.zeros(mb, jnp.int32),
        )

        a_chunk = a_chunk.astype(jnp.int32)
        b_full = b_full.astype(jnp.int32)

        def macro(state, t):
            j_b = t - d
            active = (j_b >= 0) & (j_b < NB)
            jb = jnp.clip(j_b, 0, NB - 1)
            col_base = jb * C  # global col of first column - 1
            b_block = jax.lax.dynamic_slice(b_full, (col_base,), (C,))
            cols_iota = col_base + 1 + jnp.arange(C, dtype=jnp.int32)
            top = jnp.where(d == 0, gap * cols_iota, state["frontier"])
            corner = jnp.where((d == 0),
                               gap * col_base, state["corner"])
            right, bottom, cols = tile(a_chunk, b_block, state["left"], top,
                                       corner, col_base, row_base)
            # capture the column holding global col n
            has_n = active & (col_base < n) & (n <= col_base + C)
            col_n = jnp.sum(jnp.where((cols_iota == n)[:, None], cols, 0), axis=0)
            res_col = jnp.where(has_n, col_n, state["res_col"])
            new_state = dict(
                left=jnp.where(active, right, state["left"]),
                corner=jnp.where(active, top[C - 1], state["corner"]),
                frontier=jax.lax.ppermute(
                    jnp.where(active, bottom, state["frontier"]),
                    "data", [(k, (k + 1) % D) for k in range(D)]),
                res_col=res_col,
            )
            return new_state, None

        state, _ = jax.lax.scan(macro, state, jnp.arange(NB + D - 1))
        # D[m][n] lives at local row (m-1) % mb on device (m-1) // mb
        owner = (m - 1) // mb
        val = jnp.where(d == owner,
                        jnp.sum(jnp.where(i_local == (m - 1) % mb,
                                          state["res_col"], 0)),
                        0)
        return jax.lax.psum(val, "data")[None]

    return shard_map(
        run, mesh=mesh,
        in_specs=(P("data"), P(None), P(None)),
        out_specs=P("data"), check_vma=False,
    )


def ring_wavefront_score(a, b, mesh: Mesh, match: int = 0, mismatch: int = 1,
                         gap: int = 1, objective: str = "min",
                         block_cols: int = 256) -> int:
    """Global-alignment score of ONE pair sharded across ``mesh``'s ``data``
    axis (uniform costs, linear gaps). The first operand's rows live one
    chunk per device; frontiers ride the ring."""
    a = np.asarray(bytearray(a) if isinstance(a, (bytes, bytearray)) else a)
    b = np.asarray(bytearray(b) if isinstance(b, (bytes, bytearray)) else b)
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return (m + n) * gap
    D = mesh.devices.size
    mb = -(-m // D)
    C = min(block_cols, max(-(-n // 1), 1))
    NB = -(-n // C)
    a_pad = np.full(mb * D, -2, dtype=np.int32)
    a_pad[:m] = a
    b_pad = np.full(NB * C, -3, dtype=np.int32)
    b_pad[:n] = b
    mn = np.array([m, n], dtype=np.int32)
    fn = _build_ring(mesh, mb, C, NB, match, mismatch, gap, objective == "min")
    out = fn(jnp.asarray(a_pad), jnp.asarray(b_pad), jnp.asarray(mn))
    return int(np.asarray(out)[0])
