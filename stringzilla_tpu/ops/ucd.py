"""Generated Unicode property tables — the data layer of the UTF-8 tier.

The reference ships ~40K LoC of generated UCD tables (reference
``include/stringzilla/utf8_wordbreaks/tables.h`` and siblings, produced by
``scripts/generate_unicode_tables.py`` from the UCD data files). This build
generates the same information at first use from the *exact* UCD property
database embedded in CPython's ``unicodedata`` and the ``regex`` package
(same upstream data, zero hand-derivation), packs it into dense numpy
arrays, and caches the result on disk. Tables:

* ``wb_classes``  — Word_Break property, u8[0x110000] class ids (UAX-29 §4)
* ``gcb_classes`` — Grapheme_Cluster_Break ids + Extended_Pictographic bit
* ``sb_classes``  — Sentence_Break ids (UAX-29 §5)
* ``lb_classes``  — Line_Break ids (UAX-14)
* ``fold1``       — full case folding, 1:1 part (u32 direct-index; identity
  where no folding); multi-rune expansions in ``fold_multi``

Class-id 0 is always the axis's "Other"/default class.
"""

from __future__ import annotations

import os
import threading

import numpy as np

__all__ = [
    "WB_VALUES", "GCB_VALUES", "SB_VALUES", "LB_VALUES",
    "wb_classes", "gcb_classes", "sb_classes", "lb_classes",
    "gcb_ext_pict", "fold1", "fold_multi", "ucd_version",
    "ccc", "decomp_tables", "comp_pairs", "qc_classes",
]

_MAX_CP = 0x110000

# UAX-29 / UAX-14 property value enumerations; index = class id, 0 = default.
WB_VALUES = (
    "Other", "CR", "LF", "Newline", "Extend", "ZWJ", "Regional_Indicator",
    "Format", "Katakana", "Hebrew_Letter", "ALetter", "Single_Quote",
    "Double_Quote", "MidNumLet", "MidLetter", "MidNum", "Numeric",
    "ExtendNumLet", "WSegSpace",
)
GCB_VALUES = (
    "Other", "CR", "LF", "Control", "Extend", "ZWJ", "Regional_Indicator",
    "Prepend", "SpacingMark", "L", "V", "T", "LV", "LVT",
)
SB_VALUES = (
    "Other", "CR", "LF", "Extend", "Sep", "Format", "Sp", "Lower", "Upper",
    "OLetter", "Numeric", "ATerm", "SContinue", "STerm", "Close",
)
LB_VALUES = (
    "XX", "BK", "CR", "LF", "CM", "NL", "SG", "WJ", "ZW", "GL", "SP", "ZWJ",
    "B2", "BA", "BB", "HY", "CB", "CL", "CP", "EX", "IN", "NS", "OP", "QU",
    "IS", "NU", "PO", "PR", "SY", "AI", "AL", "CJ", "EB", "EM", "H2", "H3",
    "HL", "ID", "JL", "JT", "JV", "RI", "SA", "AK", "AP", "AS", "VF", "VI",
)

_lock = threading.Lock()
_cache: dict[str, np.ndarray] = {}


def available() -> bool:
    """Whether the table generator's data source (the ``regex`` package's
    UCD property engine) is importable; callers keep a derived-class
    fallback for environments without it."""
    try:
        import regex  # noqa: F401

        return True
    except ImportError:
        return False


def ucd_version() -> str:
    import unicodedata

    return unicodedata.unidata_version


def _cache_path() -> str:
    import regex

    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    tag = f"{ucd_version()}-rx{getattr(regex, '__version__', '0')}"
    # v2: + normalization tables (ccc/decomp/composition/quick-check)
    return os.path.join(base, "stringzilla_tpu", f"ucd-v2-{tag}.npz")


def _all_codepoints_string() -> str:
    """One string containing every scalar codepoint (surrogates excluded),
    so a single compiled-regex scan classifies the whole plane set."""
    return "".join(
        chr(c) for c in range(_MAX_CP) if not (0xD800 <= c <= 0xDFFF))


def _scan_property(pattern: str, haystack: str, cp_index: np.ndarray,
                   out: np.ndarray, value: int) -> None:
    import regex

    rx = regex.compile(pattern, regex.V1)
    for m in rx.finditer(haystack):
        out[cp_index[m.start() : m.end()]] = value


def _build_axis(prop: str, values: tuple[str, ...], haystack: str,
                cp_index: np.ndarray) -> np.ndarray:
    out = np.zeros(_MAX_CP, dtype=np.uint8)
    for vid, vname in enumerate(values):
        if vid == 0:
            continue  # default class
        _scan_property(rf"\p{{{prop}={vname}}}", haystack, cp_index, out, vid)
    return out


def _build_tables() -> dict[str, np.ndarray]:
    import regex  # noqa: F401 — hard dependency of table generation only

    haystack = _all_codepoints_string()
    # position in haystack -> codepoint
    cps = np.fromiter((ord(c) for c in haystack), dtype=np.int64,
                      count=len(haystack))
    cp_index = cps  # alias: out[cp_index[pos]] = class
    tables = {
        "wb": _build_axis("Word_Break", WB_VALUES, haystack, cp_index),
        "gcb": _build_axis("Grapheme_Cluster_Break", GCB_VALUES, haystack, cp_index),
        "sb": _build_axis("Sentence_Break", SB_VALUES, haystack, cp_index),
        "lb": _build_axis("Line_Break", LB_VALUES, haystack, cp_index),
    }
    ep = np.zeros(_MAX_CP, dtype=np.uint8)
    _scan_property(r"\p{Extended_Pictographic}", haystack, cp_index, ep, 1)
    tables["ext_pict"] = ep

    # Full case folding (C+F status): CPython's str.casefold implements the
    # UCD CaseFolding.txt full mapping; sample it per codepoint once.
    fold = np.arange(_MAX_CP, dtype=np.uint32)
    multi_keys, multi_vals, multi_offs = [], [], [0]
    for c in range(_MAX_CP):
        if 0xD800 <= c <= 0xDFFF:
            continue
        f = chr(c).casefold()
        if len(f) == 1:
            fc = ord(f)
            if fc != c:
                fold[c] = fc
        else:
            multi_keys.append(c)
            multi_vals.extend(ord(ch) for ch in f)
            multi_offs.append(len(multi_vals))
            fold[c] = 0xFFFFFFFF  # sentinel: expansion in fold_multi
    tables["fold1"] = fold
    tables["fold_multi_keys"] = np.asarray(multi_keys, dtype=np.uint32)
    tables["fold_multi_vals"] = np.asarray(multi_vals, dtype=np.uint32)
    tables["fold_multi_offs"] = np.asarray(multi_offs, dtype=np.int64)
    tables.update(_build_norm_tables())
    return tables


def _build_norm_tables() -> dict[str, np.ndarray]:
    """UAX-15 normalization data, derived from CPython's own UCD:

    * ``ccc`` — Canonical_Combining_Class, u8 per codepoint;
    * full (recursive) NFD / NFKD expansions — ``unicodedata.normalize`` of
      each single codepoint already applies the recursion and the Hangul
      algorithm, so the runtime is a flat gather (reference analog:
      ``utf8_norm/tables.h``, generated from UnicodeData.txt);
    * primary composition pairs — a canonical 2-char decomposition whose NFC
      round-trips back is, by definition, a primary composite: this exactly
      reproduces CompositionExclusions.txt + singleton/non-starter rules
      without shipping the file;
    * derived quick-check classes (UAX-15 §9): NFx_QC=No where the codepoint
      itself normalizes away, Maybe where it can fuse with a preceding
      character (second element of a primary pair, incl. Hangul V/T jamo).
    """
    import unicodedata as ud

    ccc_t = np.zeros(_MAX_CP, dtype=np.uint8)
    # decomposition expansions: idx<0 → none; else vals[offs[idx]:offs[idx+1]]
    nfd_idx = np.full(_MAX_CP, -1, dtype=np.int32)
    nfkd_idx = np.full(_MAX_CP, -1, dtype=np.int32)
    nfd_vals, nfd_offs = [], [0]
    nfkd_vals, nfkd_offs = [], [0]
    pair_keys, pair_vals = [], []
    # qc: 0 = Yes, 1 = Maybe, 2 = No; one axis per form
    qc = {f: np.zeros(_MAX_CP, dtype=np.uint8) for f in
          ("nfc", "nfd", "nfkc", "nfkd")}
    for c in range(_MAX_CP):
        if 0xD800 <= c <= 0xDFFF:
            continue
        ch = chr(c)
        ccc_t[c] = ud.combining(ch)
        nfd = ud.normalize("NFD", ch)
        nfkd = ud.normalize("NFKD", ch)
        if nfd != ch:
            nfd_idx[c] = len(nfd_offs) - 1
            nfd_vals.extend(ord(x) for x in nfd)
            nfd_offs.append(len(nfd_vals))
            qc["nfd"][c] = 2
            # Primary composite ⇔ the full decomposition recomposes back;
            # an excluded composite or singleton stays decomposed under NFC.
            if ud.normalize("NFC", nfd) != ch:
                qc["nfc"][c] = 2
            # Pairs come from the SINGLE-STEP canonical decomposition (the
            # raw UnicodeData.txt field): full NFD of e.g. an LVT Hangul
            # syllable or ǻ is longer than 2 but the char still composes
            # pairwise. Hangul's algorithmic step is synthesized below.
            raw = ud.decomposition(ch)
            if raw and not raw.startswith("<") and qc["nfc"][c] == 0:
                parts = [int(h, 16) for h in raw.split()]
                if len(parts) == 2:
                    pair_keys.append((parts[0] << 21) | parts[1])
                    pair_vals.append(c)
        if nfkd != ch:
            nfkd_idx[c] = len(nfkd_offs) - 1
            nfkd_vals.extend(ord(x) for x in nfkd)
            nfkd_offs.append(len(nfkd_vals))
            qc["nfkd"][c] = 2
            if ud.normalize("NFKC", ch) != ch:
                qc["nfkc"][c] = 2
    # Hangul algorithmic composition pairs (UAX-15 §3.12): (L,V)→LV, (LV,T)→LVT.
    s_base, l_base, v_base, t_base = 0xAC00, 0x1100, 0x1161, 0x11A7
    v_count, t_count = 21, 28
    for s in range(s_base, s_base + 11172):
        s_index = s - s_base
        if s_index % t_count == 0:  # LV syllable
            l = l_base + s_index // (v_count * t_count)
            v = v_base + (s_index % (v_count * t_count)) // t_count
            pair_keys.append((l << 21) | v)
        else:  # LVT: composed from the LV syllable + trailing jamo
            lv = s_base + (s_index // t_count) * t_count
            t = t_base + s_index % t_count
            pair_keys.append((lv << 21) | t)
        pair_vals.append(s)
    # Maybe: second element of any primary pair can fuse into the previous
    # starter, so a string containing it needs verification.
    order = np.argsort(np.asarray(pair_keys, dtype=np.uint64), kind="stable")
    keys = np.asarray(pair_keys, dtype=np.uint64)[order]
    vals = np.asarray(pair_vals, dtype=np.uint32)[order]
    for second in set(int(k) & 0x1FFFFF for k in keys):
        if qc["nfc"][second] == 0:
            qc["nfc"][second] = 1
        if qc["nfkc"][second] == 0:
            qc["nfkc"][second] = 1
    qc_packed = (qc["nfc"] | (qc["nfd"] << 2) | (qc["nfkc"] << 4)
                 | (qc["nfkd"] << 6)).astype(np.uint8)
    return {
        "ccc": ccc_t,
        "nfd_idx": nfd_idx,
        "nfd_vals": np.asarray(nfd_vals, dtype=np.uint32),
        "nfd_offs": np.asarray(nfd_offs, dtype=np.int64),
        "nfkd_idx": nfkd_idx,
        "nfkd_vals": np.asarray(nfkd_vals, dtype=np.uint32),
        "nfkd_offs": np.asarray(nfkd_offs, dtype=np.int64),
        "comp_keys": keys,
        "comp_vals": vals,
        "qc": qc_packed,
    }


def _load() -> dict[str, np.ndarray]:
    if _cache:
        return _cache
    with _lock:
        if _cache:
            return _cache
        path = _cache_path()
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    _cache.update({k: z[k] for k in z.files})
                return _cache
            except Exception:
                pass  # corrupt cache → regenerate
        tables = _build_tables()
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            np.savez_compressed(tmp, **tables)
            os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
        except Exception:
            pass  # cache write is best-effort
        _cache.update(tables)
        return _cache


def wb_classes() -> np.ndarray:
    """Word_Break class ids, u8[0x110000] (UAX-29 table 3)."""
    return _load()["wb"]


def gcb_classes() -> np.ndarray:
    """Grapheme_Cluster_Break class ids (UAX-29 table 2)."""
    return _load()["gcb"]


def gcb_ext_pict() -> np.ndarray:
    """Extended_Pictographic membership, u8[0x110000] (emoji-data.txt)."""
    return _load()["ext_pict"]


def sb_classes() -> np.ndarray:
    """Sentence_Break class ids (UAX-29 table 4)."""
    return _load()["sb"]


def lb_classes() -> np.ndarray:
    """Line_Break class ids (UAX-14)."""
    return _load()["lb"]


def fold1() -> np.ndarray:
    """1:1 full case folding, u32[0x110000]; 0xFFFFFFFF marks multi-rune
    expansions (look up in ``fold_multi``)."""
    return _load()["fold1"]


def fold_multi() -> dict[int, tuple[int, ...]]:
    """Multi-rune full-fold expansions (e.g. ß → s s)."""
    t = _load()
    keys, vals, offs = t["fold_multi_keys"], t["fold_multi_vals"], t["fold_multi_offs"]
    return {int(k): tuple(int(v) for v in vals[offs[i] : offs[i + 1]])
            for i, k in enumerate(keys)}


def ccc() -> np.ndarray:
    """Canonical_Combining_Class, u8[0x110000] (UnicodeData.txt field 3)."""
    return _load()["ccc"]


def decomp_tables(compat: bool) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full recursive canonical (or compatibility) decomposition:
    ``(idx i32[0x110000] — −1 = none, vals u32[], offs i64[])``; the
    expansion of codepoint c is ``vals[offs[idx[c]] : offs[idx[c]+1]]``."""
    t = _load()
    p = "nfkd" if compat else "nfd"
    return t[f"{p}_idx"], t[f"{p}_vals"], t[f"{p}_offs"]


def comp_pairs() -> tuple[np.ndarray, np.ndarray]:
    """Primary composition pairs: sorted u64 keys ``(first << 21) | second``
    and u32 composed codepoints (UAX-15 D117, incl. Hangul algorithmic
    pairs, excl. CompositionExclusions)."""
    t = _load()
    return t["comp_keys"], t["comp_vals"]


def qc_classes() -> np.ndarray:
    """Packed quick-check classes, u8[0x110000]: two bits per form —
    bits 0-1 NFC, 2-3 NFD, 4-5 NFKC, 6-7 NFKD; 0 = Yes, 1 = Maybe, 2 = No
    (UAX-15 §9 derived properties)."""
    return _load()["qc"]
