"""Streaming memory transforms — the ``memory`` domain on TPU.

The reference's memory domain is ``sz_copy`` / ``sz_move`` / ``sz_fill`` /
``sz_lookup`` (reference ``include/stringzilla/memory.h:66-153``). On TPU the
first three are native XLA copies/fills (the compiler already emits optimal
DMA for them); the one with real kernel content is **lookup** — the 256-byte
LUT transform (21.2 GB/s AVX-512 headline, reference ``README.md:218-237``).

The kernel uses Mosaic's in-register lane gather (``take_along_axis`` along
the 128-lane axis — the TPU equivalent of AVX-512 ``VPERMB``): the 256-entry
table is split into two 128-entry lane-replicated planes, each byte does two
single-vreg shuffles and one select. ~5 VPU ops per element, vs ~128 for the
compare/select ladder this replaces (round-1 design, 6.1 GB/s).
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
BLOCK_ROWS = 2048


def _kernel(refs):
    in_ref, lut_ref, out_ref = refs
    h = in_ref[...].astype(jnp.int32)  # (R, 128)
    lo = jnp.broadcast_to(lut_ref[0:1, :], h.shape)
    hi = jnp.broadcast_to(lut_ref[1:2, :], h.shape)
    i7 = h & 127
    a = jnp.take_along_axis(lo, i7, axis=1)  # in-vreg lane shuffle
    b = jnp.take_along_axis(hi, i7, axis=1)
    out_ref[...] = jnp.where(h < 128, a, b).astype(jnp.uint8)


@functools.lru_cache(maxsize=16)
def _build(n_rows: int, interpret: bool):
    grid = (n_rows // BLOCK_ROWS,)

    def wrapped(data2d, lut2):
        return pl.pallas_call(
            lambda *refs: _kernel(refs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=8 * n_rows * LANES,
                bytes_accessed=2 * n_rows * LANES,
                transcendentals=0,
            ),
            interpret=interpret,
        )(data2d, lut2)

    return jax.jit(wrapped)


def lookup_transform(data2d: jnp.ndarray, n: int, lut: np.ndarray) -> jnp.ndarray:
    """Apply a 256-entry byte LUT to a ``(rows, 128) u8`` buffer
    (``sz_lookup``, reference ``memory.h:153``). Returns the same shape."""
    lut2 = np.asarray(lut, dtype=np.uint8).reshape(2, 128).astype(np.int32)
    rows = data2d.shape[0]
    if rows % BLOCK_ROWS:
        pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS - rows
        data2d = jnp.concatenate(
            [data2d, jnp.zeros((pad, LANES), data2d.dtype)], axis=0)
    out = _build(data2d.shape[0], platform.pallas_interpret())(
        data2d, jnp.asarray(lut2))
    return out[:rows]
