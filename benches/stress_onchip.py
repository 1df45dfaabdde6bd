#!/usr/bin/env python
"""Randomized on-chip differential soak — engines vs serial oracles.

Rotates through Levenshtein (random alphabets/shapes), Needleman-Wunsch
with random 32x32 class tables, fingerprint bit-identity against the f64
oracle, and big-buffer find/rfind/utf8_count — fresh random seed every
trial, mismatches print a reproducing seed. The long-haul complement to
benches/tpu_sweep.py (the reference's SZ_TESTS_MULTIPLIER idea,
CONTRIBUTING.md:183-236). Runs for STRESS_SECONDS (default 1800).

    python benches/stress_onchip.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import stringzilla_tpu as sz
from oracles import levenshtein, score_linear, score_affine
from stringzilla_tpu.ops.fingerprints import derive_params, fingerprint_oracle

t_end = time.time() + float(os.environ.get('STRESS_SECONDS', 1800))
rng0 = np.random.default_rng(20260817)
trial = 0
fails = 0
while time.time() < t_end:
    trial += 1
    seed = int(rng0.integers(0, 1 << 30))
    rng = np.random.default_rng(seed)
    kind = trial % 8
    try:
        if kind == 0:  # Levenshtein (byte + utf8)
            alpha = int(rng.integers(2, 26))
            qs = [bytes(rng.integers(97, 97 + alpha, int(rng.integers(0, 300))).astype(np.uint8)) for _ in range(int(rng.integers(1, 6)))]
            cs = [bytes(rng.integers(97, 97 + alpha, int(rng.integers(0, 300))).astype(np.uint8)) for _ in range(int(rng.integers(1, 40)))]
            out = sz.LevenshteinDistances()(qs, cs)
            for i, q in enumerate(qs):
                for j, c in enumerate(cs):
                    assert out[i, j] == levenshtein(q, c), ("LEV", seed, i, j)
        elif kind == 1:  # NW with class costs
            m = int(rng.integers(1, 200)); k = int(rng.integers(1, 200))
            table = rng.integers(-5, 6, (32, 32)).astype(np.int32)
            table = ((table + table.T) // 2).astype(np.int32)
            b2c = rng.integers(0, 32, 256).astype(np.uint8)
            qs = [bytes(rng.integers(0, 256, m).astype(np.uint8))]
            cs = [bytes(rng.integers(0, 256, k).astype(np.uint8))]
            eng = sz.NeedlemanWunschScores(byte_to_class=b2c, class_substitution_costs=table, open=-3, extend=-3)
            out = eng(qs, cs)
            want = score_linear(np.frombuffer(qs[0], np.uint8), np.frombuffer(cs[0], np.uint8),
                                lambda x, y: int(table[b2c[x], b2c[y]]), -3, objective="max")
            assert out[0, 0] == want, ("NW", seed)
        elif kind == 2:  # fingerprints bit-identity
            nd = int(rng.choice([16, 64, 128]))
            widths = tuple(sorted(rng.choice([3,4,5,7,9,11,15,31], size=int(rng.integers(1,4)), replace=False).tolist()))
            docs = [bytes(rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8)) for _ in range(int(rng.integers(1, 30)))]
            eng = sz.Fingerprints(ndim=nd, window_widths=widths, seed=seed % 97)
            h, c = eng(docs)
            params = derive_params(nd, widths, seed % 97)
            for i in rng.choice(len(docs), min(3, len(docs)), replace=False):
                eh, ec = fingerprint_oracle(docs[int(i)], params)
                assert (h[int(i)] == eh).all() and (c[int(i)] == ec).all(), ("FP", seed, int(i))
        elif kind == 3:  # streamed long-hash path (8/16/64 KiB buckets)
            from stringzilla_tpu.ops.hash import sz_hash
            from stringzilla_tpu.ops.hash_pallas import hash_long_device

            ncm = int(rng.choice([128, 256, 1024]))
            items = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8))
                     for n in rng.integers(64 * (ncm // 2) + 1, 64 * ncm + 63,
                                           int(rng.integers(1, 5)))]
            got = hash_long_device(items, seed % 1009, ncm)
            for i, x in enumerate(items):
                assert got[i] == sz_hash(x, seed % 1009), ("HASHLONG", seed, i)
        elif kind == 4:  # argsort vs sorted()
            words = [bytes(rng.integers(97, 123, int(rng.integers(0, 14))).astype(np.uint8))
                     for _ in range(int(rng.integers(1, 4000)))]
            order = sz.argsort(words)
            assert [words[i] for i in order] == sorted(words), ("SORT", seed)
        elif kind == 5:  # SHA-256 batch vs hashlib
            import hashlib
            msgs = [bytes(rng.integers(0, 256, int(l)).astype(np.uint8))
                    for l in rng.integers(0, 200, int(rng.integers(1, 300)))]
            from stringzilla_tpu.ops.sha256 import sha256_tape
            from stringzilla_tpu.ops.tape import Tape
            dig = sha256_tape(Tape.from_strings(msgs))
            for i in rng.choice(len(msgs), min(5, len(msgs)), replace=False):
                assert bytes(dig[int(i)]) == hashlib.sha256(msgs[int(i)]).digest(), ("SHA", seed, int(i))
        elif kind == 6:  # wavefront long-pair vs oracle
            m = int(rng.integers(200, 2000)); k = int(rng.integers(200, 2000))
            a = rng.integers(97, 102, m).astype(np.uint8)
            b = rng.integers(97, 102, k).astype(np.uint8)
            from stringzilla_tpu.ops.wavefront_pallas import wavefront_score
            got = wavefront_score(a, b)
            assert got == levenshtein(bytes(a), bytes(b)), ("WF", seed)
        else:  # big-buffer find/count/hash
            n = int(rng.integers(1 << 20, 1 << 23))
            hay = rng.integers(97, 101, n).astype(np.uint8)
            s = sz.Str(hay.tobytes())
            k = int(rng.integers(1, 12))
            p = int(rng.integers(0, n - k))
            needle = hay[p : p + k].tobytes()
            hb = hay.tobytes()
            assert s.find(needle) == hb.find(needle), ("FIND", seed)
            assert s.rfind(needle) == hb.rfind(needle), ("RFIND", seed)
            assert s.utf8_count() == n, ("COUNT", seed)
    except AssertionError as e:
        fails += 1
        print("MISMATCH:", e.args, flush=True)
        if fails > 5:
            break
print(f"stress done: {trial} trials, {fails} failures", flush=True)
