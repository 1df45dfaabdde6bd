"""Set intersection of string collections — ``sz_sequence_intersect``.

The reference builds a seeded power-of-2 open-addressing hash table with a
bounded collision budget (reference ``include/stringzilla/intersect.h:33-96``,
``README.md:909-913``). Data-dependent probing is scalar-unit poison on TPU,
so the TPU design is a **sort-merge join on hash keys**:

1. every *distinct* string of both collections gets a 64-bit seeded
   StringZilla hash (bit-identical ``ops.hash.sz_hash`` — seeding defends
   against adversarial inputs exactly like the reference's seeded table);
2. the two key arrays are sorted on device (``jax.lax.sort``, two u32 lanes
   per key) and merged with a vectorized ``searchsorted``;
3. hash-equal pairs are verified byte-exact host-side (collisions at 64 bits
   are ~0, but exactness is part of the contract).

Returns the same shape of answer as the C ABI: parallel index arrays into the
first and second sequence (first occurrence of each distinct matching string).
"""

from __future__ import annotations

import numpy as np

from .hash import sz_hash

__all__ = ["intersect"]

_DEVICE_MIN_ITEMS = 1 << 15


def _distinct_hashes(items: list[bytes], seed: int):
    """(hashes u64[k], first_index i64[k]) over distinct strings."""
    seen: dict[bytes, int] = {}
    for i, s in enumerate(items):
        if s not in seen:
            seen[s] = i
    strings = list(seen.keys())
    idx = np.fromiter(seen.values(), dtype=np.int64, count=len(seen))
    hashes = np.fromiter((sz_hash(s, seed) for s in strings), dtype=np.uint64,
                         count=len(strings))
    return strings, hashes, idx


def _sorted_match(a_keys: np.ndarray, b_keys: np.ndarray):
    """Positions (ia, ib) with a_keys[ia] == b_keys[ib], via device sort +
    searchsorted for large inputs, numpy otherwise."""
    if min(len(a_keys), len(b_keys)) >= _DEVICE_MIN_ITEMS:
        import jax.numpy as jnp

        order_a = np.asarray(jnp.argsort(jnp.asarray(a_keys)))
        order_b = np.asarray(jnp.argsort(jnp.asarray(b_keys)))
    else:
        order_a = np.argsort(a_keys, kind="stable")
        order_b = np.argsort(b_keys, kind="stable")
    sa, sb = a_keys[order_a], b_keys[order_b]
    pos = np.searchsorted(sb, sa)
    pos = np.clip(pos, 0, len(sb) - 1) if len(sb) else pos
    hit = (len(sb) > 0) & (sa == sb[np.clip(pos, 0, max(len(sb) - 1, 0))])
    ia = order_a[hit]
    ib = order_b[np.clip(pos, 0, max(len(sb) - 1, 0))[hit]]
    return ia, ib


def intersect(first, second, seed: int = 0):
    """Indices of distinct common strings: ``(first_idx i64[k], second_idx
    i64[k])`` (C ABI ``sz_sequence_intersect``, reference ``intersect.h:86``).
    Accepts lists of bytes/str, ``Tape``, or ``Strs``."""

    def as_list(x):
        if hasattr(x, "to_list"):
            return [bytes(b) for b in x.to_list()]
        return [s.encode() if isinstance(s, str) else bytes(s) for s in x]

    a_items, b_items = as_list(first), as_list(second)
    a_strs, a_hash, a_idx = _distinct_hashes(a_items, seed)
    b_strs, b_hash, b_idx = _distinct_hashes(b_items, seed)
    if not len(a_hash) or not len(b_hash):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ia, ib = _sorted_match(a_hash, b_hash)
    # Exact verification kills 64-bit collisions (and keeps adversarial
    # inputs correct, like the reference's bounded-budget rehash).
    keep = [k for k in range(len(ia)) if a_strs[ia[k]] == b_strs[ib[k]]]
    out_a = a_idx[ia[keep]] if keep else np.zeros(0, np.int64)
    out_b = b_idx[ib[keep]] if keep else np.zeros(0, np.int64)
    order = np.argsort(out_a, kind="stable")
    return out_a[order], out_b[order]
