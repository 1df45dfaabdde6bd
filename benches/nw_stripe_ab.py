"""A/B the similarity kernel's stripe width T at the protein shape."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

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


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 1.2
    rng = np.random.default_rng(0)
    args, cells = make_args(rng)
    cfg = S.SimilarityConfig(
        "max", "global", S.LinearGaps(-5),
        S.ClassCosts(tuple(range(32)) * 8,
                     tuple(tuple(r) for r in np.asarray(args[4]).tolist())))
    q, ql, c, cl, tab = args
    want = None
    for T in (8, 16, 4, 32, 8):
        SP._stripe_for = lambda cfg_, cl_, i_, T=T: T
        SP._build_call.cache_clear()
        call = SP._build_call.__wrapped__(cfg, ROWS, CAND_LEN, NQ, NC, LB,
                                          False)
        run = lambda: call(q.T.reshape(NQ, ROWS, 1), ql.reshape(NQ, 1, 1),  # noqa: E731
                           c, cl, tab)
        out = np.asarray(run())
        if want is None:
            want = out
        assert (out == want).all(), T
        t0 = time.perf_counter()
        _ = np.asarray(run()[0, 0])
        per = max(time.perf_counter() - t0, 1e-4)
        iters = max(int(dur / per), 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = run()
        _ = np.asarray(o[0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"T={T:2d}  {dt*1e3:7.2f} ms  {cells/dt/1e9:6.1f} GCUPS")


if __name__ == "__main__":
    main()
