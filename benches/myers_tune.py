"""Re-derive Myers kernel tuning at the headline bench shape (4-word lanes).

Sweeps (qpack, lane_block) on the real chip at the bench.py distribution and
prints GCUPS per config, interleaved so same-window ratios hold. Exactness is
asserted against the default config's output.

Usage: python benches/myers_tune.py [duration_per_cfg_s]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from stringzilla_tpu.ops.myers_pallas import myers_pallas  # noqa: E402


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    rng = np.random.default_rng(42)
    n_queries, n_cands, mean_len = 128, 32768, 100
    rows, cand_len = 128, 128

    def make_batch(count, maxlen):
        lens = np.clip(rng.normal(mean_len, mean_len / 8, count).astype(np.int32),
                       8, maxlen)
        chars = rng.integers(97, 123, size=(maxlen, count), dtype=np.int32)
        mask = np.arange(maxlen)[:, None] < lens[None, :]
        return np.where(mask, chars, 0), lens

    q_chars, q_lens = make_batch(n_queries, rows)
    q_t = np.where(np.arange(rows)[:, None] < q_lens[None, :], q_chars, -1)
    c_chars, c_lens = make_batch(n_cands, cand_len)
    args = (jnp.asarray(q_t.astype(np.int32)),
            jnp.asarray(q_lens.reshape(-1, 1)),
            jnp.asarray(c_chars),
            jnp.asarray(c_lens.reshape(1, -1)))
    cells = float(np.outer(q_lens.astype(np.int64), c_lens.astype(np.int64)).sum())

    want = None
    configs = [(qp, lb) for qp in (2, 4, 8, 16) for lb in (256, 512, 1024, 2048)]
    results = {}
    for qp, lb in configs:
        if qp * rows * lb * 4 > (10 << 20):  # rough VMEM guard on the eq path
            continue
        try:
            run = lambda: myers_pallas(*args, lane_block=lb, qpack=qp)  # noqa: E731
            out = np.asarray(run())
            if want is None:
                want = out
            elif (out != want).any():
                print(f"qpack={qp:2d} lane_block={lb:4d}  MISMATCH")
                continue
            t0 = time.perf_counter()
            _ = np.asarray(run()[0, 0])
            per = max(time.perf_counter() - t0, 1e-4)
            iters = max(int(dur / per), 3)
            t0 = time.perf_counter()
            for _ in range(iters):
                o = run()
            _ = np.asarray(o[0, 0])
            g = cells * iters / (time.perf_counter() - t0) / 1e9
            results[(qp, lb)] = g
            print(f"qpack={qp:2d} lane_block={lb:4d}  {g:8.1f} GCUPS")
        except Exception as e:  # noqa: BLE001
            print(f"qpack={qp:2d} lane_block={lb:4d}  FAILED: {str(e)[:100]}")
    if results:
        (qp, lb), g = max(results.items(), key=lambda kv: kv[1])
        print(f"\nbest: qpack={qp} lane_block={lb} at {g:.1f} GCUPS")


if __name__ == "__main__":
    main()
