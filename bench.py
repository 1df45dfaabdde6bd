#!/usr/bin/env python
"""Headline benchmark: batched unit-cost Levenshtein throughput in GCUPS.

Mirrors the reference's ``bench/similarities.cpp`` workload (~100-byte ASCII
lines, all-pairs batch, CUPS accounting = sum(len_q*len_c)/second). Baseline:
the reference's single-socket AVX-512 figure of 3.434 GCUPS on Sapphire Rapids
(reference ``README.md:266-283``, BASELINE.md).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N}

Env knobs (reference's STRINGWARS_* protocol, ``bench/similarities.cpp:16-31``):
    STRINGWARS_SEED     RNG seed                     (default 42)
    STRINGWARS_QUERIES  number of queries            (default 64)
    STRINGWARS_CANDS    number of candidates         (default 4096)
    STRINGWARS_LEN      mean string length           (default 100)
    STRINGWARS_DURATION target seconds of timed work (default 10)
"""

import json
import os
import time

import numpy as np


def main():
    seed = int(os.environ.get("STRINGWARS_SEED", "42"))
    n_queries = int(os.environ.get("STRINGWARS_QUERIES", "64"))
    n_cands = int(os.environ.get("STRINGWARS_CANDS", "4096"))
    mean_len = int(os.environ.get("STRINGWARS_LEN", "100"))
    duration = float(os.environ.get("STRINGWARS_DURATION", "10"))

    import jax
    import jax.numpy as jnp

    from stringzilla_tpu.ops.similarity import LinearGaps, SimilarityConfig, UniformCosts
    from stringzilla_tpu.ops.similarity_pallas import similarity_pallas

    rng = np.random.default_rng(seed)

    def make_batch(count, rows):
        lens = np.clip(rng.normal(mean_len, mean_len / 8, count).astype(np.int32), 8, rows - 1)
        chars = rng.integers(97, 123, size=(rows, count), dtype=np.int32)
        mask = np.arange(rows)[:, None] < lens[None, :]
        return np.where(mask, chars, 0), lens

    lq = 1 << (mean_len + 7 - 1).bit_length()  # pad queries a bit above mean
    rows = lq + 8
    q_chars, q_lens = make_batch(n_queries, rows)
    # shift down one row: q_ext[i] = q[i-1]
    q_ext = np.zeros_like(q_chars)
    q_ext[1:] = q_chars[:-1]
    c_chars, c_lens = make_batch(n_cands, lq)

    cfg = SimilarityConfig("min", "global", LinearGaps(1), UniformCosts(0, 1))
    q_ext_j = jnp.asarray(q_ext)
    qlens_j = jnp.asarray(q_lens.reshape(-1, 1))
    c_j = jnp.asarray(c_chars)
    clens_j = jnp.asarray(c_lens.reshape(1, -1))

    def run():
        return similarity_pallas(q_ext_j, qlens_j, c_j, clens_j, cfg)

    out = run().block_until_ready()  # compile + warm
    # sanity: distances bounded by max(len_q, len_c)
    assert int(jnp.max(out)) <= max(int(q_lens.max()), int(c_lens.max()))

    cells = float(q_lens.astype(np.int64).sum()) * 0  # per-pair product below
    cells = float(np.outer(q_lens.astype(np.int64), c_lens.astype(np.int64)).sum())

    # Timed loop
    iters = 0
    start = time.perf_counter()
    elapsed = 0.0
    while elapsed < duration:
        run().block_until_ready()
        iters += 1
        elapsed = time.perf_counter() - start
    cups = cells * iters / elapsed
    gcups = cups / 1e9

    baseline_gcups = 3.434427548  # reference SPR single-socket, README.md:266-283
    print(json.dumps({
        "metric": "batched_levenshtein_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / baseline_gcups, 3),
    }))


if __name__ == "__main__":
    main()
