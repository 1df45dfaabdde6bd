"""Device-tier UTF-8 structural validation + rune counting.

The reference's rune layer is register-wide lead-byte classification
(``sz_utf8_count``/``sz_utf8_decode``, reference ``utf8_runes.h:34-96``,
per-ISA kernels under ``utf8_runes/``). The TPU analog: RFC 3629 validity is
a *local* property — every byte's class must agree with the class of the
1-3 bytes before it — so the whole check vectorizes into shifted compares
that XLA fuses into one streaming pass over the buffer (no Pallas needed;
the ops are elementwise + static shifts):

* structural: continuation bytes exactly where a preceding lead demands;
* range: no C0/C1/F5-FF leads, no overlongs (E0 A0.., F0 90..), no
  surrogates (ED 80-9F), nothing above U+10FFFF (F4 90..);
* truncation: a trailing lead meets the mirror's zero padding, which is
  not a continuation — detected by the same structural check.

Valid buffers have exactly one rune per non-continuation byte, so the
count is a masked popcount in the same pass. Invalid buffers fall back to
the host's exact maximal-subpart (U+FFFD) semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["validate_count_device", "utf8_valid"]


@jax.jit
def _validate_count(mirror: jnp.ndarray, n: jnp.ndarray):
    """``(valid bool[], rune_count i32[])`` for the first ``n`` bytes of a
    zero-padded u8 device mirror (any shape; flattened row-major)."""
    b = mirror.reshape(-1).astype(jnp.int32)
    idx = jnp.arange(b.shape[0], dtype=jnp.int32)
    in_buf = idx < n

    cont = (b & 0xC0) == 0x80
    l2 = (b >= 0xC2) & (b <= 0xDF)
    l3 = (b & 0xF0) == 0xE0
    l4 = (b >= 0xF0) & (b <= 0xF4)
    bad_lead = (b >= 0x80) & ~cont & ~l2 & ~l3 & ~l4  # C0 C1 F5-FF

    def prev(x, k):
        pad = jnp.zeros((k,), x.dtype)
        return jnp.concatenate([pad, x[:-k]])

    must_cont = (prev(l2 | l3 | l4, 1) | prev(l3 | l4, 2) | prev(l4, 3))
    # padding is zero (ASCII): a truncated trailing sequence shows up as
    # must_cont=True on a non-continuation padding byte — checked unmasked.
    ok_struct = jnp.all(cont == must_cont)

    p1 = prev(b, 1)
    bad_rng = cont & (((p1 == 0xE0) & (b < 0xA0))     # overlong 3-byte
                      | ((p1 == 0xED) & (b >= 0xA0))  # UTF-16 surrogates
                      | ((p1 == 0xF0) & (b < 0x90))   # overlong 4-byte
                      | ((p1 == 0xF4) & (b >= 0x90)))  # > U+10FFFF

    valid = ok_struct & ~jnp.any((bad_lead | bad_rng) & in_buf)
    count = jnp.sum((~cont & in_buf).astype(jnp.int32))
    return valid, count


def validate_count_device(mirror, n: int):
    """Run the fused validation+count pass on a device mirror; returns
    ``(bool, int)`` after one host pull."""
    v, c = _validate_count(mirror, jnp.int32(n))
    return bool(np.asarray(v)), int(np.asarray(c))


def utf8_valid(data) -> bool:
    """Whether ``data`` is well-formed UTF-8 (RFC 3629). Host tier:
    CPython's decoder; big buffers on a TPU backend take the device pass."""
    from ..models.str_api import Str
    from .utf8 import _as_bytes

    if isinstance(data, Str) and data._use_device():
        valid, _ = validate_count_device(data._device(), len(data))
        return valid
    buf = _as_bytes(data)
    try:
        buf.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False
