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
    _substitution_column,
    build_sq,
    column_step,
    extract_result,
    init_columns,
    update_best,
)

__all__ = ["similarity_pallas", "pick_lane_block"]


def pick_lane_block(rows: int, cand_len: int, vmem_budget_bytes: int = 4 << 20) -> int:
    """Lanes per candidate block: as wide as the VMEM budget allows.

    DP state + temporaries cost roughly ``10 * rows * lanes * 4`` bytes plus the
    ``cand_len * lanes * 4`` character block; VMEM plays the role the L1 budget
    plays in the reference's small/large scheduler split
    (``serial.hpp:3334-3345``).
    """
    per_lane = 10 * rows * 4 + cand_len * 4
    lanes = vmem_budget_bytes // max(per_lane, 1)
    lanes = max(128, min(1024, lanes))
    # Round down to a power of two so any 128-multiple candidate count divides.
    return 1 << (lanes.bit_length() - 1)


def _kernel_body(cfg: SimilarityConfig, cand_len: int, refs: tuple):
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
    best0 = jnp.zeros((1, lanes), jnp.int32)

    # Note: software-pipelining the substitution column (as the Myers kernel
    # does with its Eq mask) was measured SLOWER here — the loop-carried sub
    # is (rows, lanes) int32 (megabytes at protein shapes), and the extra
    # carry materialization costs more than the overlap hides.
    def body(j, carry):
        state, best = carry
        c_row = cands_ref[pl.ds(j - 1, 1), :]  # (1, lanes)
        state = column_step(state, j, c_row, q_ext, clens, cfg, sq)
        if cfg.is_local:
            best = update_best(best, state[0], j, qlen, clens, cfg)
        return (state, best)

    state, best = jax.lax.fori_loop(1, cand_len + 1, body, (state0, best0))
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

    kernel = functools.partial(_kernel_body, cfg, cand_len)

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
