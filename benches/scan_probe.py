"""Microbenchmark the vector primitives that make up the similarity chain scan.

Times Pallas kernels that run N dependent iterations of one probe op-sequence
on a (1088, 128) tile — the protein-shape scan tile — so per-op costs can be
compared (roll distances, masked passes, int16 vs int32, lane vs sublane axis,
jnp.roll vs pltpu.roll). Ratios are meaningful even on a time-shared chip as
long as rows are captured back-to-back.

Usage: python benches/scan_probe.py [N_ITERS]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 1088, 128
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
BIG = 1 << 20


def make_kernel(body_fn, dtype):
    def kernel(x_ref, o_ref):
        def step(i, t):
            return body_fn(t, i)
        o_ref[...] = jax.lax.fori_loop(0, N, step, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
        )(x)

    return run


def timed(run, x, reps=6):
    r = run(x)
    np.asarray(r[0, 0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        r = run(x)
    np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / reps / N * 1e9  # ns per iteration


def main():
    results = {}
    x32 = jnp.asarray(np.random.randint(0, 1000, (ROWS, LANES)), jnp.int32)
    x16 = x32.astype(jnp.int16)

    iota32 = None

    def probe(name, dtype, body):
        x = x32 if dtype == jnp.int32 else x16
        try:
            ns = timed(make_kernel(body, dtype), x)
            results[name] = ns
            print(f"{name:34s} {ns:9.1f} ns/iter")
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED: {str(e)[:120]}")

    # ALU baseline: one add
    probe("add_i32", jnp.int32, lambda t, i: t + 1)
    probe("add_i16", jnp.int16, lambda t, i: t + jnp.int16(1))
    # two chained adds (to see per-op increment)
    probe("add2_i32", jnp.int32, lambda t, i: (t + 1) + 3)

    # rolls via jnp.roll (what the kernel uses today)
    for d in (1, 2, 4, 8, 32, 64):
        probe(f"jnproll{d}_min_i32", jnp.int32,
              lambda t, i, d=d: jnp.minimum(t, jnp.roll(t, d, axis=0)))
    # pltpu.roll
    for d in (1, 8):
        probe(f"tpuroll{d}_min_i32", jnp.int32,
              lambda t, i, d=d: jnp.minimum(t, pltpu.roll(t, d, 0)))
    # int16 rolls
    for d in (1, 8):
        probe(f"jnproll{d}_min_i16", jnp.int16,
              lambda t, i, d=d: jnp.minimum(t, jnp.roll(t, d, axis=0)))

    # lane-axis roll
    probe("lanroll1_min_i32", jnp.int32,
          lambda t, i: jnp.minimum(t, jnp.roll(t, 1, axis=1)))

    # full masked pass (the real scan pass): roll + where + min
    def masked_pass(t, i, d, dtype):
        rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        rolled = jnp.roll(t, d, axis=0)
        return jnp.minimum(t, jnp.where(rows < d, dtype(BIG), rolled))

    probe("maskpass1_i32", jnp.int32,
          lambda t, i: masked_pass(t, i, 1, jnp.int32))
    probe("maskpass1_i16", jnp.int16,
          lambda t, i: masked_pass(t, i, 1, jnp.int16))

    # the current production scan (two-level blocked, B=64) per column
    sys.path.insert(0, "/root/repo")
    from stringzilla_tpu.ops.similarity import SimilarityConfig, _cum_opt_down

    cfg = SimilarityConfig()
    probe("cum_opt_down_full_i32", jnp.int32,
          lambda t, i: _cum_opt_down(t, cfg))

    # pure doubling scan (11 passes, no blocking) for comparison
    def pure_doubling(t, i):
        d = 1
        rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        while d < ROWS:
            t = jnp.minimum(t, jnp.where(rows < d, BIG, jnp.roll(t, d, axis=0)))
            d *= 2
        return t

    probe("pure_doubling_i32", jnp.int32, pure_doubling)

    if "add_i32" in results:
        base = results["add_i32"]
        print("\nrelative to add_i32:")
        for k, v in results.items():
            print(f"  {k:32s} {v / base:6.2f}x")


if __name__ == "__main__":
    main()
