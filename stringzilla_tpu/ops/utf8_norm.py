"""Own UAX-15 normalization machinery — NFC/NFD/NFKC/NFKD over generated
UCD tables (reference: ``include/stringzilla/utf8_norm.h:46-60`` + its
generated ``utf8_norm/tables.h``; the reference's quick-check short-circuit
is described in ``README.md:899-903``).

Pipeline (D-forms): full-decomposition gather → canonical reordering;
C-forms add the canonical pairwise recomposition (UAX-15 D117). The
decomposition and reordering stages are vectorized numpy (single gather +
one stable ``lexsort``); composition is the textbook starter-walk. A packed
quick-check table (derived per UAX-15 §9) short-circuits already-normalized
text — the overwhelmingly common case — to a single vectorized scan.

``unicodedata`` is used only at table-generation time (``ucd.py``); at
runtime the only fallback use is when the table source is unavailable.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "normalize_runes", "utf8_norm", "utf8_is_normalized",
    "utf8_find_denormalized",
]

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")
_QC_SHIFT = {"NFC": 0, "NFD": 2, "NFKC": 4, "NFKD": 6}

_pairs_dict: dict[int, int] | None = None


def _encode(runes: np.ndarray) -> bytes:
    """u32 scalar runes → UTF-8 (the native encoder when available)."""
    from ..utils import native

    arr = np.asarray(runes, dtype=np.uint32)
    if native.available():
        out = native.utf8_encode(arr)
        if out is not None:
            return bytes(out)
    return arr.astype("<u4").tobytes().decode("utf-32-le").encode("utf-8")


def _pairs() -> dict[int, int]:
    global _pairs_dict
    if _pairs_dict is None:
        from . import ucd

        keys, vals = ucd.comp_pairs()
        _pairs_dict = {int(k): int(v) for k, v in zip(keys, vals)}
    return _pairs_dict


def _decompose(runes: np.ndarray, compat: bool) -> np.ndarray:
    """Full recursive decomposition as one gather + repeat-expansion."""
    from . import ucd

    idx, vals, offs = ucd.decomp_tables(compat)
    di = idx[runes]
    has = di >= 0
    if not has.any():
        return runes
    lens = np.ones(len(runes), dtype=np.int64)
    lens[has] = offs[di[has] + 1] - offs[di[has]]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = int(lens.sum())
    src = np.repeat(np.arange(len(runes)), lens)
    within = np.arange(total) - starts[src]
    exp = has[src]
    gather = offs[np.maximum(di[src], 0)] + within
    return np.where(exp, vals[np.where(exp, gather, 0)],
                    runes[src]).astype(np.uint32)


def _reorder(runes: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonical ordering: stable sort of each nonzero-ccc run (UAX-15 D108).
    One ``lexsort`` — segment id (starters open segments), then ccc, then
    original position for stability."""
    seg = np.cumsum(c == 0)
    order = np.lexsort((np.arange(len(runes)), c, seg))
    return runes[order], c[order]


def _compose(runes: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Canonical pairwise composition (UAX-15 D117 starter walk)."""
    pairs = _pairs()
    out: list[int] = []
    starter_pos = -1
    last_cc = 0
    for r, cc in zip(runes.tolist(), c.tolist()):
        cc = int(cc)
        if starter_pos >= 0 and (last_cc < cc or last_cc == 0):
            comp = pairs.get((out[starter_pos] << 21) | int(r))
            if comp is not None:
                out[starter_pos] = comp
                continue
        out.append(int(r))
        if cc == 0:
            starter_pos = len(out) - 1
            last_cc = 0
        else:
            last_cc = cc
    return np.asarray(out, dtype=np.uint32)


def normalize_runes(runes: np.ndarray, form: str) -> np.ndarray:
    """Normalize a u32 rune array to the given form (own machinery)."""
    from . import ucd

    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}")
    if len(runes) == 0:
        return np.asarray(runes, dtype=np.uint32)
    runes = np.asarray(runes, dtype=np.uint32)
    dec = _decompose(runes, compat=form in ("NFKC", "NFKD"))
    c = ucd.ccc()[dec]
    dec, c = _reorder(dec, c)
    if form in ("NFC", "NFKC"):
        dec = _compose(dec, c)
    return dec


def _suspects(runes: np.ndarray, form: str) -> np.ndarray:
    """Indices where quick-check is not Yes or canonical order is violated."""
    from . import ucd

    qc = (ucd.qc_classes()[runes] >> _QC_SHIFT[form]) & 0x3
    c = ucd.ccc()[runes]
    bad = qc != 0
    if len(runes) > 1:
        viol = np.zeros(len(runes), dtype=bool)
        viol[1:] = (c[1:] != 0) & (c[1:] < c[:-1])
        bad |= viol
    return np.nonzero(bad)[0]


def _seq_bounds(c: np.ndarray, i: int) -> tuple[int, int]:
    """[start, end) of the combining sequence containing rune index i."""
    start = i
    while start > 0 and c[start] != 0:
        start -= 1
    end = i + 1
    n = len(c)
    while end < n and c[end] != 0:
        end += 1
    return start, end


def _first_divergent(runes: np.ndarray, form: str) -> int:
    """Rune index of the start of the first combining sequence that is not
    in normal form, or -1. Quick-check Maybe hits are verified by
    normalizing just their combining sequence."""
    from . import ucd

    sus = _suspects(runes, form)
    if len(sus) == 0:
        return -1
    c = ucd.ccc()[runes]
    checked_until = -1
    for i in sus.tolist():
        if i < checked_until:
            continue
        start, end = _seq_bounds(c, i)
        # A starter suspect (e.g. Hangul V/T jamo, QC=Maybe) composes with
        # the PRECEDING starter — pull it into the window; combining-mark
        # suspects already rewound onto their starter.
        if start == i and c[i] == 0 and start > 0:
            start -= 1
        window = runes[start:end]
        norm = normalize_runes(window, form)
        if not np.array_equal(norm, window):
            # first rune the normalization actually rewrites
            k = min(len(norm), len(window))
            same = np.nonzero(norm[:k] != window[:k])[0]
            return start + (int(same[0]) if len(same) else k)
        checked_until = end
    return -1


def utf8_norm(data, form: str = "NFC") -> bytes:
    """UAX-15 normalization of a UTF-8 buffer (``sz_utf8_norm``, reference
    ``utf8_norm.h:46``). Quick-check clean input is returned as-is."""
    from . import ucd
    from .utf8 import _as_bytes, utf8_decode

    buf = _as_bytes(data)
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}")
    if not ucd.available():  # tables unavailable → stdlib fallback
        import unicodedata

        return unicodedata.normalize(
            form, buf.decode("utf-8", "replace")).encode("utf-8")
    runes = utf8_decode(buf)
    if _first_divergent(runes, form) < 0:
        return bytes(buf)
    return _encode(normalize_runes(runes, form))


def utf8_is_normalized(data, form: str = "NFC") -> bool:
    from . import ucd
    from .utf8 import _as_bytes, utf8_decode

    buf = _as_bytes(data)
    if not ucd.available():
        import unicodedata

        return unicodedata.is_normalized(form, buf.decode("utf-8", "replace"))
    return _first_divergent(utf8_decode(buf), form) < 0


def utf8_find_denormalized(data, form: str = "NFC") -> int:
    """Byte offset of the first combining sequence that is not in normal
    form, or -1 (``sz_utf8_find_denormalized``, reference ``utf8_norm.h:60``)."""
    from . import ucd
    from .utf8 import _as_bytes, utf8_decode

    buf = _as_bytes(data)
    if not ucd.available():
        import unicodedata

        s = buf.decode("utf-8", "replace")
        if unicodedata.is_normalized(form, s):
            return -1
        t = unicodedata.normalize(form, s)
        p = 0
        while p < len(s) and p < len(t) and s[p] == t[p]:
            p += 1
        seq_start = min(p, len(s) - 1)
        while seq_start > 0 and unicodedata.combining(s[seq_start]):
            seq_start -= 1
        return len(s[:seq_start].encode("utf-8"))
    runes = utf8_decode(buf)
    i = _first_divergent(runes, form)
    if i < 0:
        return -1
    return int(len(_encode(runes[:i])))
