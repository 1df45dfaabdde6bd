"""Device argsort of string collections — the ``sz_sequence_argsort`` analog.

The reference exports pointer-sized "pgrams" (first 8 bytes) to a contiguous
buffer, runs a 3-way-partition QuickSort on them, and recurses into equal runs
at deeper offsets (reference ``include/stringzilla/sort.h:87,141``,
``sort/serial.h:25-105``). Recursion into data-dependent equal runs is hostile
to XLA, so the TPU design sorts ONCE, lexicographically, on the full key
ladder:

* pad every string to ``8 * ceil(maxlen/8)`` bytes with ``0x00`` (shorter
  strings order before their extensions, matching byte-wise order);
* view each 8-byte group big-endian as two ``uint32`` lanes — the pgram
  export, vectorized;
* one ``jax.lax.sort`` call over ``(hi0, lo0, hi1, lo1, ..., iota)`` — XLA's
  bitonic/multi-operand sort on device; the trailing iota both makes the sort
  stable and returns the permutation.

``reverse=True`` inverts the key bytes (``0xFF - b``) before sorting, which
yields descending order while keeping ties in original (stable) order —
matching the reference's ``reverse`` flag (``sort.h:24-26``).
``top_count`` returns only the first K indices (``sort.h:24``, partial mode).

The uncased variant folds ASCII case before key export
(``sz_sequence_argsort_uncased``, ``sort.h:114`` — reference folds uncased
chunks on the fly, ``sort.h:18-22``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["argsort_strings", "argsort_tape", "pack_pgram_keys"]

_DEVICE_MIN_ITEMS = 1 << 14  # below this, host lexsort wins on latency


def pack_pgram_keys(items: list[bytes], reverse: bool = False,
                    uncased: bool = False) -> np.ndarray:
    """Dense big-endian key matrix ``uint32[n, 2*ceil(maxlen/8)]``."""
    n = len(items)
    maxlen = max((len(s) for s in items), default=0)
    width = max(-(-maxlen // 8) * 8, 8)
    dense = np.zeros((n, width), dtype=np.uint8)
    for i, s in enumerate(items):
        dense[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    if uncased:
        is_upper = (dense >= 65) & (dense <= 90)
        dense = np.where(is_upper, dense + 32, dense)
    if reverse:
        dense = 255 - dense
    # big-endian u32 per 4 bytes → lexicographic order == numeric order
    keys = dense.reshape(n, -1, 4).astype(np.uint32) @ np.array(
        [1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint32
    )
    # Length tiebreak: zero-padding makes "ap" == "ap\x00" — the shorter
    # string must order first (byte-wise order on true lengths).
    lens = np.array([len(s) for s in items], dtype=np.uint32)
    if reverse:
        lens = np.uint32(0xFFFFFFFF) - lens
    return np.concatenate([keys, lens[:, None]], axis=1)


@partial(jax.jit, static_argnames=("num_keys",))
def _device_argsort(keys: jnp.ndarray, num_keys: int) -> jnp.ndarray:
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = tuple(keys[:, c] for c in range(num_keys)) + (iota,)
    out = jax.lax.sort(operands, dimension=0, is_stable=True,
                       num_keys=num_keys)
    return out[-1]


def argsort_strings(items: list[bytes], reverse: bool = False,
                    top_count: int | None = None,
                    uncased: bool = False) -> np.ndarray:
    """Stable argsort permutation of a list of byte strings."""
    n = len(items)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    keys = pack_pgram_keys(items, reverse=reverse, uncased=uncased)
    if n < _DEVICE_MIN_ITEMS:
        order = np.lexsort(tuple(keys[:, c] for c in reversed(range(keys.shape[1]))))
    else:
        order = np.asarray(_device_argsort(jnp.asarray(keys), keys.shape[1]))
    order = order.astype(np.int64)
    if top_count is not None:
        order = order[:top_count]
    return order


def argsort_tape(tape, **kwargs) -> np.ndarray:
    """Argsort of a ``Tape`` (the ``szs``-style tape container)."""
    return argsort_strings(tape.to_list(), **kwargs)
