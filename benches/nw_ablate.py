"""Attribute NW/SW kernel time at the protein shape: how much of the column
step is the chain scan vs the substitution matmul vs the rest.

Monkeypatches ``similarity._cum_opt_down`` with pass-truncated variants
(results WRONG for truncated modes — timing only) and rebuilds the Pallas
kernel via ``_build_call.__wrapped__`` (bypassing its lru_cache).

Usage: python benches/nw_ablate.py [duration_s]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import stringzilla_tpu.ops.similarity as S  # noqa: E402
import stringzilla_tpu.ops.similarity_pallas as SP  # noqa: E402

ROWS, CAND_LEN, NQ, NC, LB = 1032, 1024, 16, 512, 128


def make_args(rng):
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    b2c = np.zeros(256, dtype=np.uint8)
    for i, ch in enumerate(aa):
        b2c[ch] = i
    table = rng.integers(-4, 6, (32, 32)).astype(np.int32)
    table = ((table + table.T) // 2).astype(np.int32)
    np.fill_diagonal(table, rng.integers(4, 10, 32))

    qlens = np.clip(rng.normal(1000, 100, NQ).astype(np.int32), 100, 1024)
    clens = np.clip(rng.normal(1000, 100, NC).astype(np.int32), 100, 1024)
    q_ext = np.zeros((ROWS, NQ), np.int32)
    for i, l in enumerate(qlens):
        q_ext[1 : l + 1, i] = b2c[rng.choice(aa, l)]
    cands = np.zeros((CAND_LEN, NC), np.int32)
    for i, l in enumerate(clens):
        cands[:l, i] = b2c[rng.choice(aa, l)]
    cells = float(np.outer(qlens.astype(np.int64), clens.astype(np.int64)).sum())
    return (jnp.asarray(q_ext), jnp.asarray(qlens.reshape(-1, 1)),
            jnp.asarray(cands), jnp.asarray(clens.reshape(1, -1)),
            jnp.asarray(table)), cells


def truncated_cum_opt(passes):
    def fn(t, cfg):
        rows = t.shape[0]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        d = 1
        for _ in range(passes):
            if d >= rows:
                break
            rolled = jnp.roll(t, d, axis=0)
            t = cfg.opt(t, jnp.where(rows_iota < d, cfg.ident, rolled))
            d *= 2
        return t
    return fn


def two_level(B, reduce_carries):
    """Exact two-level scan variant: block size B; carries via axis-reduce
    instead of strided tail slice when reduce_carries."""
    def _shift_down(x, d, fill, cfg):
        rolled = jnp.roll(x, d, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(rows < d, fill, rolled)

    def fn(t, cfg):
        rows, lanes = t.shape
        nb = -(-rows // B)
        pad = nb * B - rows
        if pad:
            t = jnp.concatenate(
                [t, jnp.full((pad, lanes), cfg.ident, t.dtype)], axis=0)
        in_block = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) & (B - 1)
        d = 1
        while d < B:
            rolled = jnp.roll(t, d, axis=0)
            t = cfg.opt(t, jnp.where(in_block < d, cfg.ident, rolled))
            d *= 2
        if reduce_carries:
            red = jnp.min if cfg.objective == "min" else jnp.max
            carries = red(t.reshape(nb, B, lanes), axis=1)
        else:
            carries = t.reshape(nb, B, lanes)[:, B - 1, :]
        d = 1
        while d < nb:
            carries = cfg.opt(carries, _shift_down(carries, d, cfg.ident, cfg))
            d *= 2
        prev_carry = _shift_down(carries, 1, cfg.ident, cfg)
        full = jnp.broadcast_to(prev_carry[:, None, :], (nb, B, lanes))
        t = cfg.opt(t, full.reshape(nb * B, lanes))
        return t[:rows] if pad else t
    return fn


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    rng = np.random.default_rng(0)
    args, cells = make_args(rng)
    cfg = S.SimilarityConfig(
        "max", "global", S.LinearGaps(-5),
        S.ClassCosts(tuple(range(32)) * 8, tuple(tuple(r) for r in
                     np.asarray(args[4]).tolist())))

    orig = S._cum_opt_down
    modes = [("full", None), ("redcarry64", two_level(64, True)),
             ("redcarry128", two_level(128, True)),
             ("slice128", two_level(128, False)),
             ("redcarry32", two_level(32, True)),
             ("scan0", truncated_cum_opt(0)), ("full2", None)]
    want = None
    for name, repl in modes:
        S._cum_opt_down = orig if repl is None else repl
        try:
            call = SP._build_call.__wrapped__(cfg, ROWS, CAND_LEN, NQ, NC, LB,
                                              False)
            q, ql, c, cl, tab = args
            run = lambda: call(q.T.reshape(NQ, ROWS, 1),  # noqa: E731
                               ql.reshape(NQ, 1, 1), c, cl, tab)
            first = np.asarray(run())
            if name == "full":
                want = first
            elif name.startswith(("redcarry", "slice")):
                assert (first == want).all(), f"{name} INEXACT"
            t0 = time.perf_counter()
            _ = np.asarray(run()[0, 0])
            per = max(time.perf_counter() - t0, 1e-4)
            iters = max(int(dur / per), 3)
            t0 = time.perf_counter()
            for _ in range(iters):
                o = run()
            _ = np.asarray(o[0, 0])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:8s} {dt*1e3:8.2f} ms/call  ({cells/dt/1e9:7.1f} GCUPS-equiv)")
        finally:
            S._cum_opt_down = orig


if __name__ == "__main__":
    main()
