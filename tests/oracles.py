"""Slow, obviously-correct NumPy DP oracles for differential testing.

These mirror the reference's Python-side oracles: a hand-written Wagner-Fischer
for Levenshtein (reference ``test/similarities.py:47-76``) and an independent
Gotoh three-matrix DP for affine gaps (``test/similarities.py:80+``).
"""

from __future__ import annotations

import numpy as np

NEG = -(10**9)
POS = 10**9


def levenshtein(a: bytes, b: bytes, match=0, mismatch=1, gap=1) -> int:
    """Wagner-Fischer with uniform costs and linear gaps (minimization)."""
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64) * gap
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i * gap
        for j in range(1, m + 1):
            sub = match if a[i - 1] == b[j - 1] else mismatch
            cur[j] = min(prev[j] + gap, cur[j - 1] + gap, prev[j - 1] + sub)
        prev = cur
    return int(prev[m])


def score_linear(a: bytes, b: bytes, sub_fn, gap: int, objective="max", local=False) -> int:
    """Generic linear-gap DP: NW (global max) / SW (local max) / distances."""
    opt = max if objective == "max" else min
    n, m = len(a), len(b)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    if not local:
        D[:, 0] = np.arange(n + 1) * gap
        D[0, :] = np.arange(m + 1) * gap
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = D[i - 1, j - 1] + sub_fn(a[i - 1], b[j - 1])
            cell = opt(D[i - 1, j] + gap, D[i, j - 1] + gap)
            if local:
                s = opt(s, 0)
            cell = opt(cell, s)
            D[i, j] = cell
            best = opt(best, cell)
    return int(best if local else D[n, m])


def score_affine(a: bytes, b: bytes, sub_fn, open_: int, extend: int,
                 objective="max", local=False) -> int:
    """Independent Gotoh three-matrix DP matching the reference's semantics:
    a k-long gap costs ``open + extend*(k-1)``; gap matrices boundary-padded by
    ``open+extend`` (reference ``serial.hpp:1134-1146``)."""
    opt = max if objective == "max" else min
    n, m = len(a), len(b)

    def bound(k):
        return 0 if (local or k == 0) else open_ + extend * (k - 1)

    def gbound(k):
        return (0 if local else bound(k)) + open_ + extend

    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    I = np.zeros((n + 1, m + 1), dtype=np.int64)  # gaps along j
    V = np.zeros((n + 1, m + 1), dtype=np.int64)  # gaps along i
    for i in range(n + 1):
        D[i, 0] = bound(i)
        I[i, 0] = gbound(i)
        V[i, 0] = gbound(i)
    for j in range(m + 1):
        D[0, j] = bound(j)
        I[0, j] = gbound(j)
        V[0, j] = gbound(j)
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            I[i, j] = opt(D[i, j - 1] + open_, I[i, j - 1] + extend)
            V[i, j] = opt(D[i - 1, j] + open_, V[i - 1, j] + extend)
            s = D[i - 1, j - 1] + sub_fn(a[i - 1], b[j - 1])
            if local:
                s = opt(s, 0)
            cell = opt(opt(I[i, j], V[i, j]), s)
            D[i, j] = cell
            best = opt(best, cell)
    return int(best if local else D[n, m])


def random_strings(rng, count, min_len=0, max_len=64, alphabet=b"abcd") -> list[bytes]:
    out = []
    for _ in range(count):
        n = int(rng.integers(min_len, max_len + 1))
        out.append(bytes(rng.choice(list(alphabet), size=n)))
    return out
