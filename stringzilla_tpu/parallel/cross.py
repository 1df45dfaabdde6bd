"""Mesh-parallel cross-product scoring.

The reference parallelizes cross-products over a NUMA thread pool
(``cross_in_parallel_``, reference ``similarities/serial.hpp:3296-3395``). The
TPU-native equivalent shards the candidate axis over the scope's mesh with
``shard_map``: queries are replicated (the "shared query broadcast" of the
lane walker), candidates and the result matrix are sharded along ``data``, and
all communication rides the ICI when results are gathered.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.myers_pallas import myers_pallas
from ..ops.similarity import SimilarityConfig
from ..ops.similarity_pallas import similarity_pallas

__all__ = ["sharded_similarity", "sharded_myers"]


def sharded_myers(q_t, qlens, cands_t, clens, mesh: Mesh,
                  lane_block: int | None = None):
    """Candidate-sharded Myers bit-parallel distances: queries replicated,
    candidates and results split along the mesh's ``data`` axis."""

    def run(q, ql, c, cl):
        return myers_pallas(q, ql, c, cl, lane_block=lane_block)

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"), check_vma=False,
    )
    return fn(q_t, qlens, cands_t, clens)


def sharded_similarity(
    q_ext_t,  # (rows, n_queries) replicated
    qlens,  # (n_queries, 1) replicated
    cands_t,  # (cand_len, n_cands) — n_cands divisible by ndev * lane_block
    clens,  # (1, n_cands)
    cfg: SimilarityConfig,
    mesh: Mesh,
    table=None,
    lane_block: int | None = None,
):
    """Returns ``(n_queries, n_cands) int32`` sharded along the candidate axis."""
    has_table = table is not None

    def run(q, ql, c, cl, *tb):
        return similarity_pallas(q, ql, c, cl, cfg, tb[0] if has_table else None,
                                 lane_block=lane_block)

    in_specs = [P(None, None), P(None, None), P(None, "data"), P(None, "data")]
    if has_table:
        in_specs.append(P(None, None))
    fn = shard_map(
        run, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(None, "data"),
        check_vma=False,
    )
    args = (q_ext_t, qlens, cands_t, clens) + ((table,) if has_table else ())
    return fn(*args)


def sharded_fingerprints(docs_t, lens, width: int, mult, m_limbs, fd_limbs,
                         inv_m, mesh: Mesh, lane_block: int = 128):
    """Document-sharded MinHash fingerprints: the dimension parameters are
    replicated, documents and outputs split along ``data`` — the analog of
    the reference's docs×dim-groups thread fan-out
    (``floating_rolling_hashers_in_parallel_``, ``fingerprints/serial.hpp:994``)."""
    from ..ops.fingerprints_pallas import fingerprint_width_group

    def run(d, l, mu, ml, fl, im):
        return fingerprint_width_group(d, l, width, mu, ml, fl, im,
                                       lane_block=lane_block)

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, None),
                  P(None, None, None), P(None, None, None), P(None, None)),
        out_specs=(P(None, "data"), P(None, "data")), check_vma=False,
    )
    return fn(docs_t, lens, mult, m_limbs, fd_limbs, inv_m)
