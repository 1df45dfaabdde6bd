"""Fingerprints engine — public API mirroring ``szs.Fingerprints``.

Reference Python type: ``stringzillas.Fingerprints(ndim, window_widths=None,
alphabet_size=256, seed=0, capabilities=None)`` (``python/stringzillas.c:
2085-2150``), called as ``engine(texts, device=None)`` and returning
``(min_hashes, min_counts)`` — two ``(docs, ndim) uint32`` arrays
(``python/stringzillas.c:2162-2300``, C ABI ``stringzillas.h:516-580``).

Outputs are bit-identical to the reference's f64 engines: the TPU kernel
computes the same 52-bit modular arithmetic in int32 limbs (see
``ops/fingerprints_pallas.py``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.fingerprints import DEFAULT_WINDOW_WIDTHS, derive_params
from ..ops.fingerprints_pallas import fingerprint_width_group, pack_limbs
from ..ops.tape import Tape, round_up
from ..utils import native
from .device_scope import DeviceScope, default_device_scope

__all__ = ["Fingerprints"]


def _as_byte_arrays(items) -> list[np.ndarray]:
    if isinstance(items, Tape):
        items = items.to_list()
    out = []
    for s in items:
        if isinstance(s, str):
            s = s.encode("utf-8")
        elif isinstance(s, (bytearray, memoryview)):
            s = bytes(s)
        out.append(np.frombuffer(s, dtype=np.uint8))
    return out


def _dyadic(n: int, minimum: int = 8) -> int:
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


class Fingerprints:
    def __init__(self, ndim: int, window_widths=None, alphabet_size: int = 256,
                 seed: int = 0, capabilities=None):
        del capabilities  # accepted for API parity
        if ndim <= 0:
            raise ValueError("ndim must be positive")
        self.ndim = int(ndim)
        self.alphabet_size = int(alphabet_size)
        self.seed = int(seed)
        self.window_widths = tuple(int(w) for w in window_widths) if window_widths is not None else DEFAULT_WINDOW_WIDTHS
        self._params = derive_params(self.ndim, self.window_widths, self.seed)
        # Group dimensions by window width; each group runs as one kernel call
        # with its dims down the sublane axis.
        self._groups = []
        widths = self._params["width"]
        for w in sorted(set(int(x) for x in widths)):
            dim_idx = np.nonzero(widths == w)[0]
            g = len(dim_idx)
            g_pad = round_up(g, 8)
            pad = np.concatenate([dim_idx, np.repeat(dim_idx[-1:], g_pad - g)])
            mult = self._params["mult"][pad].astype(np.int32).reshape(g_pad, 1)
            m_limbs = pack_limbs(self._params["modulo"][pad]).reshape(3, g_pad, 1)
            fd_limbs = pack_limbs(self._params["fused_disc"][pad]).reshape(3, g_pad, 1)
            inv_m = (1.0 / self._params["modulo"][pad].astype(np.float32)).reshape(g_pad, 1)
            self._groups.append({
                "width": w,
                "dim_idx": dim_idx,
                "mult": jnp.asarray(mult),
                "m_limbs": jnp.asarray(m_limbs),
                "fd_limbs": jnp.asarray(fd_limbs),
                "inv_m": jnp.asarray(inv_m),
            })

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Fingerprints(ndim={self.ndim},window_widths={len(self.window_widths)},"
                f"alphabet_size={self.alphabet_size},seed={self.seed})")

    def __call__(self, texts, device: DeviceScope | None = None,
                 out=None) -> tuple[np.ndarray, np.ndarray]:
        scope = device or default_device_scope()
        ndev = scope.device_count
        docs = _as_byte_arrays(texts)
        n = len(docs)
        min_hashes = np.full((n, self.ndim), 0xFFFFFFFF, dtype=np.uint32)
        min_counts = np.zeros((n, self.ndim), dtype=np.uint32)
        if n == 0:
            return min_hashes, min_counts

        lens = np.array([len(d) for d in docs], dtype=np.int64)
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        blob = (np.concatenate(docs) if lens.sum() else np.zeros(0, np.uint8))
        sizes = np.array([_dyadic(x) for x in lens], dtype=np.int64)
        for bucket in np.unique(sizes):
            idx = np.nonzero(sizes == bucket)[0]
            count = round_up(len(idx), 128 * ndev)
            docs_t, blens = native.pack_i32(blob, offsets, idx, count,
                                            int(bucket), transpose=True, fill=0)
            docs_j = jnp.asarray(docs_t)
            lens_j = jnp.asarray(blens.reshape(1, count))
            for grp in self._groups:
                if ndev > 1:
                    from ..parallel.cross import sharded_fingerprints

                    h, c = sharded_fingerprints(
                        docs_j, lens_j, grp["width"], grp["mult"],
                        grp["m_limbs"], grp["fd_limbs"], grp["inv_m"],
                        scope.mesh,
                    )
                else:
                    h, c = fingerprint_width_group(
                        docs_j, lens_j, grp["width"], grp["mult"], grp["m_limbs"],
                        grp["fd_limbs"], grp["inv_m"],
                    )
                h = np.asarray(h).view(np.uint32)
                c = np.asarray(c).view(np.uint32)
                g = len(grp["dim_idx"])
                min_hashes[np.ix_(idx, grp["dim_idx"])] = h[:g, : len(idx)].T
                min_counts[np.ix_(idx, grp["dim_idx"])] = c[:g, : len(idx)].T

        if out is not None:
            out_h, out_c = out
            out_h[...] = min_hashes
            out_c[...] = min_counts
            return out_h, out_c
        return min_hashes, min_counts
