"""ctypes bridge to the native host runtime
(``stringzilla_tpu/native/tapecraft.cpp``).

Builds the shared library on first use with the system toolchain into a
per-user cache directory, keyed by a hash of the source + compiler flags
(mtime is meaningless after a git checkout, and a foreign-ISA binary keyed
by mtime could SIGILL at call time). Every entry point has a pure-numpy
fallback, so the package works even without a compiler — the native path is
the production host tier (the reference's host runtime is C/C++ as well).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

__all__ = ["lib", "available", "pack_i32", "pack_u8", "tokenize_ws",
           "split_lines", "pgram_keys"]

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "tapecraft.cpp")
_FLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread"]

_lock = threading.Lock()
_lib = None
_tried = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "stringzilla_tpu")


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        src = f.read()
    key = hashlib.sha256(src + " ".join(_FLAGS).encode()).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"libtapecraft-{key}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        subprocess.run(["g++", *_FLAGS, _SRC, "-o", tmp],
                       check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic under concurrent builders
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def lib():
    """The loaded ctypes library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        c_i64 = ctypes.c_int64
        c_p = ctypes.c_void_p
        L.tc_pack_u8.argtypes = [c_p, c_p, c_p, c_i64, c_p, c_i64, c_i64, ctypes.c_int]
        L.tc_pack_i32.argtypes = [c_p, c_p, c_p, c_i64, c_p, c_i64, c_i64,
                                  ctypes.c_int, ctypes.c_int32, c_p]
        L.tc_pack_runes_i32.argtypes = L.tc_pack_i32.argtypes
        L.tc_tokenize_ws.argtypes = [c_p, c_i64, c_p, c_i64]
        L.tc_tokenize_ws.restype = c_i64
        L.tc_split_lines.argtypes = [c_p, c_i64, c_p, c_i64]
        L.tc_split_lines.restype = c_i64
        L.tc_pgram_keys.argtypes = [c_p, c_p, c_p, c_i64, c_p, c_i64,
                                    ctypes.c_int, ctypes.c_int]
        L.tc_argsort_keys.argtypes = [c_p, c_i64, ctypes.c_int32, c_p]
        L.tc_bytesum.argtypes = [c_p, c_i64]
        L.tc_bytesum.restype = ctypes.c_uint64
        L.tc_hash.argtypes = [c_p, c_i64, ctypes.c_uint64]
        L.tc_hash.restype = ctypes.c_uint64
        L.tc_hash_batch.argtypes = [c_p, c_p, c_i64, ctypes.c_uint64, c_p]
        L.tc_hash_bounds.argtypes = [c_p, c_p, c_p, c_i64, ctypes.c_uint64, c_p]
        L.tc_fill_random.argtypes = [c_p, c_i64, ctypes.c_uint64]
        L.tc_sha256_compress.argtypes = [c_p, c_p, c_i64]
        L.tc_sha256.argtypes = [c_p, c_i64, c_p]
        L.tc_sha256_batch.argtypes = [c_p, c_p, c_i64, c_p]
        L.tc_utf8_decode.argtypes = [c_p, c_i64, c_p, c_p]
        L.tc_utf8_decode.restype = c_i64
        L.tc_utf8_encode.argtypes = [c_p, c_i64, c_p]
        L.tc_utf8_encode.restype = c_i64
        L.tc_fold_runes.argtypes = [c_p, c_i64, c_p, c_p, c_p, c_p, c_i64,
                                    c_p, c_p]
        L.tc_fold_runes.restype = c_i64
        L.tc_utf8_fold_bytes.argtypes = [c_p, c_i64, c_p, c_p, c_p, c_p,
                                         c_i64, c_p]
        L.tc_utf8_fold_bytes.restype = c_i64
        L.tc_utf8_uncased_find.argtypes = [c_p, c_i64, c_p, c_i64, c_i64,
                                           c_p, c_p, c_p, c_p, c_i64, c_p, c_p]
        L.tc_utf8_uncased_find.restype = ctypes.c_int
        L.tc_pgram_keys_unicode.argtypes = [c_p, c_p, c_p, c_i64, c_p, c_i64,
                                            ctypes.c_int, c_p, c_p, c_p, c_p,
                                            c_i64]
        L.tc_sb_breaks.argtypes = [c_p, c_i64, c_p, c_p, c_i64]
        L.tc_sb_breaks.restype = c_i64
        L.tc_wb_breaks.argtypes = [c_p, c_i64, c_p, c_p, c_p, c_i64]
        L.tc_wb_breaks.restype = c_i64
        L.tc_gb_breaks.argtypes = [c_p, c_i64, c_p, c_p, c_p, c_i64]
        L.tc_gb_breaks.restype = c_i64
        L.tc_lb_breaks.argtypes = [c_p, c_i64, c_p, c_p, c_p, c_i64]
        L.tc_lb_breaks.restype = c_i64
        for nm in ("tc_sb_breaks32", "tc_wb_breaks32", "tc_gb_breaks32",
                   "tc_lb_breaks32"):
            fn = getattr(L, nm)
            fn.argtypes = getattr(L, nm[:-2]).argtypes
            fn.restype = c_i64
        _lib = L
        return _lib


def available() -> bool:
    return lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def pack_i32(data: np.ndarray, offsets: np.ndarray, indices: np.ndarray | None,
             rows: int, row_len: int, transpose: bool, fill: int,
             runes: bool = False):
    """Ragged→dense int32 pack. Returns (matrix, lengths int32[rows])."""
    count = len(indices) if indices is not None else len(offsets) - 1
    shape = (row_len, rows) if transpose else (rows, row_len)
    out = np.empty(shape, dtype=np.int32)
    lengths = np.zeros(rows, dtype=np.int32)
    L = lib()
    if L is not None:
        idx = None
        if indices is not None:
            idx = np.ascontiguousarray(indices, dtype=np.int64)
        data = np.ascontiguousarray(data)
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        fn = L.tc_pack_runes_i32 if runes else L.tc_pack_i32
        fn(_ptr(data), _ptr(offsets), _ptr(idx) if idx is not None else None,
           count, _ptr(out), rows, row_len, int(transpose), fill, _ptr(lengths))
        return out, lengths
    # numpy fallback
    out.fill(fill)
    for r in range(count):
        i = int(indices[r]) if indices is not None else r
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        lengths[r] = hi - lo
        n = min(hi - lo, row_len)
        seg = data[lo : lo + n]
        if transpose:
            out[:n, r] = seg
        else:
            out[r, :n] = seg
    return out, lengths


def pack_u8(data: np.ndarray, offsets: np.ndarray, indices: np.ndarray | None,
            rows: int, row_len: int, transpose: bool = False) -> np.ndarray:
    count = len(indices) if indices is not None else len(offsets) - 1
    shape = (row_len, rows) if transpose else (rows, row_len)
    out = np.zeros(shape, dtype=np.uint8)
    L = lib()
    if L is not None:
        idx = np.ascontiguousarray(indices, dtype=np.int64) if indices is not None else None
        L.tc_pack_u8(_ptr(np.ascontiguousarray(data)),
                     _ptr(np.ascontiguousarray(offsets, dtype=np.int64)),
                     _ptr(idx) if idx is not None else None,
                     count, _ptr(out), rows, row_len, int(transpose))
        return out
    for r in range(count):
        i = int(indices[r]) if indices is not None else r
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        n = min(hi - lo, row_len)
        if transpose:
            out[:n, r] = data[lo : lo + n]
        else:
            out[r, :n] = data[lo : lo + n]
    return out


def tokenize_ws(data: np.ndarray) -> np.ndarray:
    """Whitespace token [start, end) bounds, shape (k, 2) int64."""
    L = lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    if L is not None:
        count = L.tc_tokenize_ws(_ptr(data), n, None, 0)
        bounds = np.empty((count, 2), dtype=np.int64)
        L.tc_tokenize_ws(_ptr(data), n, _ptr(bounds), count)
        return bounds
    import re

    spans = [(m.start(), m.end())
             for m in re.finditer(rb"[^ \t\n\r\x0b\x0c]+", data.tobytes())]
    return np.asarray(spans, dtype=np.int64).reshape(-1, 2)


def split_lines(data: np.ndarray) -> np.ndarray:
    L = lib()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    if L is not None:
        count = L.tc_split_lines(_ptr(data), n, None, 0)
        bounds = np.empty((count, 2), dtype=np.int64)
        L.tc_split_lines(_ptr(data), n, _ptr(bounds), count)
        return bounds
    spans = []
    pos = 0
    for line in data.tobytes().splitlines():
        start = pos
        spans.append((start, start + len(line)))
        pos = start + len(line) + 1
    return np.asarray(spans, dtype=np.int64).reshape(-1, 2)


def utf8_decode(data: np.ndarray):
    """Decode UTF-8 to ``(runes u32[k], offsets i32[k+1])`` with U+FFFD per
    maximal subpart (Python ``errors="replace"`` semantics). None when the
    native library is unavailable."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    runes = np.empty(n, dtype=np.uint32)  # never more runes than bytes
    offsets = np.empty(n + 1, dtype=np.int32)
    count = L.tc_utf8_decode(_ptr(data), n, _ptr(runes), _ptr(offsets))
    return runes[:count], offsets[: count + 1]


def utf8_encode(runes: np.ndarray) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    runes = np.ascontiguousarray(runes, dtype=np.uint32)
    out = np.empty(4 * runes.shape[0] + 4, dtype=np.uint8)
    n = L.tc_utf8_encode(_ptr(runes), runes.shape[0], _ptr(out))
    return out[:n]


def fold_runes(runes: np.ndarray, fold1: np.ndarray, mkeys: np.ndarray,
               moffs: np.ndarray, mvals: np.ndarray, with_src: bool = True):
    """Full case folding over a rune array; returns (folded u32[m],
    src_index i64[m] | None). None when native is unavailable."""
    L = lib()
    if L is None:
        return None
    runes = np.ascontiguousarray(runes, dtype=np.uint32)
    k = runes.shape[0]
    out = np.empty(3 * k + 4, dtype=np.uint32)
    src = np.empty(3 * k + 4, dtype=np.int64) if with_src else None
    m = L.tc_fold_runes(_ptr(runes), k, _ptr(np.ascontiguousarray(fold1)),
                        _ptr(np.ascontiguousarray(mkeys)),
                        _ptr(np.ascontiguousarray(moffs)),
                        _ptr(np.ascontiguousarray(mvals)), len(mkeys),
                        _ptr(out), _ptr(src) if with_src else None)
    return out[:m], (src[:m] if with_src else None)


def utf8_fold_bytes(data: np.ndarray, fold1: np.ndarray, mkeys: np.ndarray,
                    moffs: np.ndarray, mvals: np.ndarray) -> np.ndarray | None:
    """Fused decode→fold→encode of a UTF-8 buffer (ASCII fast path).
    Returns a view into per-thread scratch — copy (``bytes(...)``) before
    the next native call on this thread."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    out = _scratch_u8(3 * n + 16)  # caller copies (bytes()) before reuse
    m = L.tc_utf8_fold_bytes(_ptr(data), n, _ptr(np.ascontiguousarray(fold1)),
                             _ptr(np.ascontiguousarray(mkeys)),
                             _ptr(np.ascontiguousarray(moffs)),
                             _ptr(np.ascontiguousarray(mvals)), len(mkeys),
                             _ptr(out))
    return out[:m]


def utf8_uncased_find(data: np.ndarray, needle_folded: np.ndarray,
                      start_rune: int, fold1, mkeys, moffs, mvals):
    """Fused on-the-fly case-insensitive search (no folded-haystack
    materialization). Returns (byte_off, byte_len) or (-1, 0); None when the
    native library is unavailable."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    nd = np.ascontiguousarray(needle_folded, dtype=np.uint32)
    off = ctypes.c_int64(0)
    ln = ctypes.c_int64(0)
    hit = L.tc_utf8_uncased_find(
        _ptr(data), data.shape[0], _ptr(nd), nd.shape[0], int(start_rune),
        _ptr(np.ascontiguousarray(fold1)), _ptr(np.ascontiguousarray(mkeys)),
        _ptr(np.ascontiguousarray(moffs)), _ptr(np.ascontiguousarray(mvals)),
        len(mkeys), ctypes.byref(off), ctypes.byref(ln))
    return (off.value, ln.value) if hit else (-1, 0)


def hash_one(data: np.ndarray, seed: int) -> int | None:
    """Native sz_hash of one buffer; None when the library is unavailable."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    return int(L.tc_hash(_ptr(data) if data.size else None, data.shape[0],
                         ctypes.c_uint64(seed)))


def hash_tape(data: np.ndarray, offsets: np.ndarray, seed: int):
    """Native sz_hash over a tape; u64[count] or None."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    count = offsets.shape[0] - 1
    out = np.empty(count, dtype=np.uint64)
    L.tc_hash_batch(_ptr(data), _ptr(offsets), count,
                    ctypes.c_uint64(seed), _ptr(out))
    return out


def hash_bounds(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                seed: int):
    """Native sz_hash over (start, end) spans of one buffer; u64[n] or None."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    out = np.empty(starts.shape[0], dtype=np.uint64)
    L.tc_hash_bounds(_ptr(data), _ptr(starts), _ptr(ends), starts.shape[0],
                     ctypes.c_uint64(seed), _ptr(out))
    return out


def fill_random(length: int, nonce: int) -> bytes | None:
    L = lib()
    if L is None or length <= 0:
        return None if L is None else b""
    out = np.empty(length, dtype=np.uint8)
    L.tc_fill_random(_ptr(out), length, ctypes.c_uint64(nonce))
    return out.tobytes()


def sha256_one(data: np.ndarray) -> bytes | None:
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(32, dtype=np.uint8)
    L.tc_sha256(_ptr(data) if data.size else None, data.shape[0], _ptr(out))
    return out.tobytes()


def sha256_compress(state: np.ndarray, blocks: np.ndarray) -> bool:
    """Run `blocks` (k*64 bytes) through the native compressor, updating
    `state` (u32[8]) in place. False when the library is unavailable."""
    L = lib()
    if L is None:
        return False
    assert state.dtype == np.uint32 and state.flags["C_CONTIGUOUS"]
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    L.tc_sha256_compress(_ptr(state), _ptr(blocks), blocks.shape[0] // 64)
    return True


def sha256_tape(data: np.ndarray, offsets: np.ndarray):
    """Native SHA-256 over a tape; (count, 32) u8 or None."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    count = offsets.shape[0] - 1
    out = np.empty((count, 32), dtype=np.uint8)
    L.tc_sha256_batch(_ptr(data), _ptr(offsets), count, _ptr(out))
    return out


def wb_breaks(data: np.ndarray, wb_table: np.ndarray,
              ep_table: np.ndarray, count_only: bool = False):
    """UAX-29 word-boundary byte offsets; None when native is absent.
    ``count_only`` runs the drain/enumerate mode (no output array) — the
    contract ICU's BreakIterator and the reference's fill-and-drain
    segmenters are benchmarked under."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    wb = np.ascontiguousarray(wb_table, np.uint8)
    ep = np.ascontiguousarray(ep_table, np.uint8)
    if count_only:
        return int(L.tc_wb_breaks(_ptr(data), n, _ptr(wb), _ptr(ep), None, 0))
    # one pass with a word-text-sized guess (~2 boundaries per 6-byte word);
    # rare overflow pays a second exact pass
    fn, scratch, dt = ((L.tc_wb_breaks32, _scratch_i32, np.int32)
                       if n < 2**31 else
                       (L.tc_wb_breaks, _scratch_i64, np.int64))
    cap = n // 2 + 64
    out = scratch(cap)
    cap = out.shape[0]
    cnt = fn(_ptr(data), n, _ptr(wb), _ptr(ep), _ptr(out), cap)
    if cnt > cap:
        out = np.empty(cnt, dtype=dt)
        fn(_ptr(data), n, _ptr(wb), _ptr(ep), _ptr(out), cnt)
        return out
    return out[:cnt].copy()


_seg_scratch = threading.local()


def _scratch_i64(cap: int) -> np.ndarray:
    """Reusable per-thread int64 scratch for the segmentation emitters.
    Fresh np.empty per call costs more than the automaton itself at GB/s
    rates (page faults on tens of MB); the scratch is faulted once and
    reused, with one word per page touched on growth."""
    buf = getattr(_seg_scratch, "i64", None)
    if buf is None or buf.shape[0] < cap:
        buf = np.empty(int(cap * 5 // 4) + 64, np.int64)
        buf[:: 4096 // 8] = 0  # pre-touch one word per page
        _seg_scratch.i64 = buf
    return buf


def _scratch_i32(cap: int) -> np.ndarray:
    """int32 variant — the export fast path (n < 2^31 byte offsets): half
    the write+copy bandwidth of the int64 scratch, which dominates when a
    boundary lands on nearly every byte (plain-text graphemes)."""
    buf = getattr(_seg_scratch, "i32", None)
    if buf is None or buf.shape[0] < cap:
        buf = np.empty(int(cap * 5 // 4) + 64, np.int32)
        buf[:: 4096 // 4] = 0  # pre-touch one word per page
        _seg_scratch.i32 = buf
    return buf


def _scratch_u8(cap: int) -> np.ndarray:
    """Reusable per-thread byte scratch (same rationale as ``_scratch_i64``)."""
    buf = getattr(_seg_scratch, "u8", None)
    if buf is None or buf.shape[0] < cap:
        buf = np.empty(int(cap * 5 // 4) + 64, np.uint8)
        buf[::4096] = 0  # pre-touch one byte per page
        _seg_scratch.u8 = buf
    return buf


def gb_breaks(data: np.ndarray, gcb_table: np.ndarray,
              ep_table: np.ndarray, count_only: bool = False):
    """UAX-29 grapheme-boundary byte offsets; None when native is absent."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    gcb = np.ascontiguousarray(gcb_table, np.uint8)
    ep = np.ascontiguousarray(ep_table, np.uint8)
    if count_only:
        return int(L.tc_gb_breaks(_ptr(data), n, _ptr(gcb), _ptr(ep), None, 0))
    fn, scratch = ((L.tc_gb_breaks32, _scratch_i32) if n < 2**31 else
                   (L.tc_gb_breaks, _scratch_i64))
    out = scratch(n + 1)
    cnt = fn(_ptr(data), n, _ptr(gcb), _ptr(ep), _ptr(out), out.shape[0])
    return out[:cnt].copy()


def sb_breaks(data: np.ndarray, sb_table: np.ndarray,
              count_only: bool = False):
    """UAX-29 sentence-break byte offsets; None when native is absent."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    if count_only:
        return int(L.tc_sb_breaks(
            _ptr(data), n, _ptr(np.ascontiguousarray(sb_table, np.uint8)),
            None, 0))
    fn, scratch = ((L.tc_sb_breaks32, _scratch_i32) if n < 2**31 else
                   (L.tc_sb_breaks, _scratch_i64))
    out = scratch(n + 1)
    cnt = fn(_ptr(data), n,
             _ptr(np.ascontiguousarray(sb_table, np.uint8)),
             _ptr(out), out.shape[0])
    return out[:cnt].copy()


def lb_breaks(data: np.ndarray, lb_table: np.ndarray,
              count_only: bool = False):
    """UAX-14 line-break (offsets, mandatory) arrays; None when absent."""
    L = lib()
    if L is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    if count_only:
        return int(L.tc_lb_breaks(
            _ptr(data), n, _ptr(np.ascontiguousarray(lb_table, np.uint8)),
            None, None, 0))
    fn, scratch = ((L.tc_lb_breaks32, _scratch_i32) if n < 2**31 else
                   (L.tc_lb_breaks, _scratch_i64))
    out = scratch(n + 1)
    mand = np.empty(n + 1, dtype=np.uint8)
    cnt = fn(_ptr(data), n,
             _ptr(np.ascontiguousarray(lb_table, np.uint8)),
             _ptr(out), _ptr(mand), out.shape[0])
    return out[:cnt].copy(), mand[:cnt].astype(bool)


def argsort_keys(keys: np.ndarray) -> np.ndarray | None:
    """Stable argsort of a (n, w) u32 key matrix (column 0 most significant);
    None when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    n, w = keys.shape
    order = np.empty(n, dtype=np.int64)
    L.tc_argsort_keys(_ptr(keys), n, w, _ptr(order))
    return order


def pgram_keys(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
               words_per_str: int, uncased: bool = False,
               reverse: bool = False) -> np.ndarray | None:
    """Per-string sort keys: big-endian u32 pgrams + length tiebreak,
    shape (count, words_per_str + 1) uint32. None when native is absent
    (caller falls back to the numpy packer in ops.sort). ``uncased`` folds
    ASCII only — use :func:`pgram_keys_unicode` for full-Unicode folding."""
    count = len(starts)
    L = lib()
    if L is None:
        return None
    out = np.empty((count, words_per_str + 1), dtype=np.uint32)
    L.tc_pgram_keys(_ptr(np.ascontiguousarray(data)),
                    _ptr(np.ascontiguousarray(starts, dtype=np.int64)),
                    _ptr(np.ascontiguousarray(ends, dtype=np.int64)),
                    count, _ptr(out), words_per_str, int(uncased), int(reverse))
    return out


def pgram_keys_unicode(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                       words_per_str: int, reverse: bool, fold1, mkeys,
                       moffs, mvals) -> np.ndarray | None:
    """Uncased sort keys with full Unicode case folding during export
    (``sz_sequence_argsort_uncased``, reference ``sort.h:18-22``): key bytes
    come from the progressively folded string; malformed UTF-8 orders as
    U+FFFD. None when native is absent."""
    count = len(starts)
    L = lib()
    if L is None:
        return None
    out = np.empty((count, words_per_str + 1), dtype=np.uint32)
    L.tc_pgram_keys_unicode(
        _ptr(np.ascontiguousarray(data)),
        _ptr(np.ascontiguousarray(starts, dtype=np.int64)),
        _ptr(np.ascontiguousarray(ends, dtype=np.int64)),
        count, _ptr(out), words_per_str, int(reverse),
        _ptr(np.ascontiguousarray(fold1)),
        _ptr(np.ascontiguousarray(mkeys)),
        _ptr(np.ascontiguousarray(moffs)),
        _ptr(np.ascontiguousarray(mvals)), len(mkeys))
    return out
