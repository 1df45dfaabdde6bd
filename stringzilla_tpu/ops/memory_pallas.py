"""Streaming memory transforms — the ``memory`` domain on TPU.

The reference's memory domain is ``sz_copy`` / ``sz_move`` / ``sz_fill`` /
``sz_lookup`` (reference ``include/stringzilla/memory.h:66-153``). On TPU the
first three are native XLA copies/fills (the compiler already emits optimal
DMA for them); the one with real kernel content is **lookup** — the 256-byte
LUT transform (21.2 GB/s AVX-512 headline, reference ``README.md:218-237``).

Gathers are scalar-unit poison on TPU, so the LUT is applied with a
**64-word select ladder**: the table is packed into 64 ``u32`` words of 4
entries each; for every input byte the word is picked by 64 vectorized
compare+selects on ``idx >> 2`` and the entry extracted with one shift+mask —
dense VPU work, no memory-indexed access, streamed block-by-block like
``find_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import platform

__all__ = ["lookup_transform"]

LANES = 128
BLOCK_ROWS = 1024


def _kernel(refs):
    in_ref, words_ref, out_ref = refs
    h = in_ref[...].astype(jnp.int32)
    widx = h >> 2
    word = jnp.zeros(h.shape, jnp.int32)
    for w in range(64):
        word = jnp.where(widx == w, words_ref[0, w], word)
    byte = (word >> ((h & 3) << 3)) & 0xFF
    out_ref[...] = byte.astype(jnp.uint8)


@functools.lru_cache(maxsize=16)
def _build(n_rows: int, interpret: bool):
    grid = (n_rows // BLOCK_ROWS,)

    def wrapped(data2d, words):
        return pl.pallas_call(
            lambda *refs: _kernel(refs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=140 * n_rows * LANES,
                bytes_accessed=2 * n_rows * LANES,
                transcendentals=0,
            ),
            interpret=interpret,
        )(data2d, words)

    return jax.jit(wrapped)


def lookup_transform(data2d: jnp.ndarray, n: int, lut: np.ndarray) -> jnp.ndarray:
    """Apply a 256-entry byte LUT to a ``(rows, 128) u8`` buffer
    (``sz_lookup``, reference ``memory.h:153``). Returns the same shape."""
    words = np.asarray(lut, dtype=np.uint8).reshape(64, 4).astype(np.uint32)
    packed = (words[:, 0] | (words[:, 1] << 8) | (words[:, 2] << 16)
              | (words[:, 3] << 24)).view(np.int32).reshape(1, 64)
    call = _build(data2d.shape[0], platform.pallas_interpret())
    return call(data2d, jnp.asarray(packed))
