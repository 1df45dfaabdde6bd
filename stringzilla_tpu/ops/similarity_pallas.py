"""Pallas TPU kernel for the lane-packed similarity DP.

Computes the exact same recurrence as the jnp oracle in ``similarity.py`` (the
column-walk with prefix-scan linearization), but entirely on-chip: the
candidate block, query, and both DP columns live in VMEM; every column step is
dense VPU work; class-cost substitution rides the MXU via one-hot matmuls.

Grid layout: ``(queries, candidate_blocks)`` — one program scores one query
against one 128*k-lane candidate block, the TPU analog of the reference's
``cross_product_candidate_lanes_range_`` host driver
(reference ``include/stringzillas/similarities/serial.hpp:3459-3631``) with the
grid playing the role of the thread pool's ``for_n_dynamic``
(``serial.hpp:3673-3696``).

On non-TPU backends the identical kernel body runs through the Pallas
interpreter — the "QEMU role" in the reference's test strategy
(reference ``CONTRIBUTING.md:218-244``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform
from .similarity import (
    SimilarityConfig,
    build_sq,
    column_step,
    extract_result,
    init_columns,
    substitution_stripe,
    update_best,
)

__all__ = ["similarity_pallas", "pick_lane_block"]


def pick_lane_block(rows: int, cand_len: int, vmem_budget_bytes: int = 4 << 20) -> int:
    """Lanes per candidate block: as wide as the VMEM budget allows.

    DP state + temporaries cost roughly ``10 * rows * lanes * 4`` bytes, the
    8-column substitution stripe adds ``8 * rows * 8`` (f32 contraction + i32
    cast), plus the ``cand_len * lanes * 4`` character block; VMEM plays the
    role the L1 budget plays in the reference's small/large scheduler split
    (``serial.hpp:3334-3345``).
    """
    per_lane = 10 * rows * 4 + 8 * rows * 8 + cand_len * 4
    lanes = vmem_budget_bytes // max(per_lane, 1)
    lanes = max(128, min(1024, lanes))
    # Round down to a power of two so any 128-multiple candidate count divides.
    return 1 << (lanes.bit_length() - 1)


def _stripe_for(cfg: SimilarityConfig, cand_len: int, interpret: bool) -> int:
    """Columns per stripe: one substitution build + T unrolled DP steps.
    Striping only pays when there is an MXU contraction to amortize
    (class costs); the uniform-cost compare is cheapest per column. The
    interpret/CPU tier keeps T=1 — XLA:CPU chokes on the unrolled body
    (minutes of compile) that Mosaic eats in seconds."""
    # cand_len < 16 keeps T=1: striping an 8-sublane (single-tile) candidate
    # block crashes Mosaic's ApplyVectorLayout for every T>1 form tried
    # (static or dynamic sub-block loads alike: "limits[i] <= dim(i)"), and
    # such tiny buckets carry negligible DP work anyway.
    if interpret or not cfg.uses_classes or cand_len < 16:
        return 1
    for t in (8, 4, 2):
        if cand_len % t == 0:
            return t
    return 1


def _kernel_body(cfg: SimilarityConfig, cand_len: int, stripe: int,
                 refs: tuple):
    if cfg.uses_classes:
        qext_ref, qlen_ref, cands_ref, clens_ref, table_ref, out_ref = refs
    else:
        qext_ref, qlen_ref, cands_ref, clens_ref, out_ref = refs
        table_ref = None

    q_ext = qext_ref[0]  # block (1, rows, 1) → (rows, 1) int32
    clens = clens_ref[...]  # (1, lanes) int32
    qlen = qlen_ref[0, 0, 0]
    lanes = clens.shape[1]
    rows = q_ext.shape[0]

    sq = build_sq(q_ext, table_ref[...]) if cfg.uses_classes else None
    state0 = init_columns(rows, lanes, cfg)
    best0 = jnp.zeros((rows, lanes) if cfg.is_local else (1, lanes), jnp.int32)

    # Stripe of T columns per loop iteration: the substitution costs for all
    # T columns come from ONE one-hot contraction (N = T·lanes fills the MXU;
    # per-column N = 128 starves it) and the T unrolled column steps give the
    # VLIW scheduler cross-column overlap — measured +24% with the blocked
    # scan at the protein shape. (Software-pipelining sub ACROSS loop
    # iterations was measured slower: the loop-carried (rows, lanes) carry
    # costs more than the overlap hides.)
    T = stripe

    def body(s, carry):
        state, best = carry
        if T > 1:
            # One (T, lanes) block load; each row is then selected by an
            # exact masked-sum sublane reduction and the flat (1, T*lanes)
            # stripe is the rows' lane concatenation. Row EXTRACTION
            # (blk[t], blk[t:t+1], reshape, or a static single-row ref
            # load) instead crashes Mosaic's ApplyVectorLayout at sublane
            # offsets ("limits[i] <= dim(i)") — only reductions and
            # lane-aligned concats touch the sublane axis here.
            blk = cands_ref[pl.ds(s * T, T), :]  # (T, lanes)
            rowi = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
            c_flat = jnp.concatenate(
                [jnp.sum(jnp.where(rowi == t, blk, 0), axis=0, keepdims=True)
                 for t in range(T)], axis=1)  # (1, T*lanes)
            # ONE one-hot contraction covers all T columns; column_step
            # ignores c_row when sub is supplied.
            subs = substitution_stripe(q_ext, c_flat, cfg, sq)
            for t in range(T):
                state = column_step(state, s * T + t + 1, None, q_ext, clens,
                                    cfg, sq,
                                    sub=subs[:, t * lanes:(t + 1) * lanes])
                if cfg.is_local:
                    best = update_best(best, state[0], cfg)
            return (state, best)
        # T == 1 (uniform costs, or interpret tier): per-column dynamic ref
        # load; materializing an eq-stripe was measured SLOWER here (no
        # matmul to amortize).
        c_row = cands_ref[pl.ds(s, 1), :]  # (1, lanes)
        state = column_step(state, s + 1, c_row, q_ext, clens, cfg, sq)
        if cfg.is_local:
            best = update_best(best, state[0], cfg)
        return (state, best)

    state, best = jax.lax.fori_loop(0, cand_len // T, body, (state0, best0))
    out_ref[0] = extract_result(state[0], qlen, clens, cfg, best)


@functools.lru_cache(maxsize=256)
def _build_call(cfg: SimilarityConfig, rows: int, cand_len: int, n_queries: int,
                n_cands: int, lane_block: int, interpret: bool):
    grid = (n_queries, n_cands // lane_block)

    in_specs = [
        # Queries stored (n_queries, rows, 1): each program pulls one (rows, 1)
        # column — the trailing dims satisfy Mosaic's (8, =array) tiling rule.
        pl.BlockSpec((1, rows, 1), lambda qi, cb: (qi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda qi, cb: (qi, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((cand_len, lane_block), lambda qi, cb: (0, cb), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lane_block), lambda qi, cb: (0, cb), memory_space=pltpu.VMEM),
    ]
    if cfg.uses_classes:
        in_specs.append(pl.BlockSpec((32, 32), lambda qi, cb: (0, 0), memory_space=pltpu.VMEM))

    rough_cell_flops = 20 + 4 * max(rows.bit_length(), 1)
    cost = pl.CostEstimate(
        flops=rough_cell_flops * rows * cand_len * n_cands * n_queries // max(n_cands // lane_block, 1) // max(n_queries, 1),
        bytes_accessed=(rows * 4 + cand_len * lane_block * 4 + lane_block * 4),
        transcendentals=0,
    )

    kernel = functools.partial(_kernel_body, cfg, cand_len,
                               _stripe_for(cfg, cand_len, interpret))

    def wrapped(*args):
        out = pl.pallas_call(
            lambda *refs: kernel(refs),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, lane_block), lambda qi, cb: (qi, 0, cb), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_queries, 1, n_cands), jnp.int32),
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        return out.reshape(n_queries, n_cands)

    return jax.jit(wrapped)


def similarity_pallas(
    q_ext_t: jnp.ndarray,  # (rows, n_queries) int32 — queries down sublanes
    qlens: jnp.ndarray,  # (n_queries, 1) int32
    cands_t: jnp.ndarray,  # (cand_len, n_cands) int32 — candidates across lanes
    clens: jnp.ndarray,  # (1, n_cands) int32
    cfg: SimilarityConfig,
    table: jnp.ndarray | None = None,
    lane_block: int | None = None,
) -> jnp.ndarray:
    """All-pairs scores ``(n_queries, n_cands) int32`` for one shape bucket."""
    rows, n_queries = q_ext_t.shape
    cand_len, n_cands = cands_t.shape
    if lane_block is None:
        lane_block = pick_lane_block(rows, cand_len)
    lane_block = min(lane_block, n_cands)
    if n_cands % lane_block:
        raise ValueError(f"n_cands {n_cands} not a multiple of lane_block {lane_block}")
    call = _build_call(cfg, rows, cand_len, n_queries, n_cands, lane_block,
                       platform.pallas_interpret())
    queries_3d = q_ext_t.T.reshape(n_queries, rows, 1)
    args = [queries_3d, qlens.reshape(n_queries, 1, 1), cands_t, clens]
    if cfg.uses_classes:
        assert table is not None
        args.append(table)
    return call(*args)
