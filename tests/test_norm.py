"""UAX-15 normalization — own machinery vs the CPython UCD oracle.

Mirrors the reference's utf8_norm coverage (``test/utf8_norm.cpp`` strategy:
differential against a trusted implementation over targeted + fuzzed
inputs). The implementation under test uses ``unicodedata`` only at
table-generation time; these tests call it directly as the oracle.
"""

import random
import unicodedata

import numpy as np
import pytest

from stringzilla_tpu.ops import ucd
from stringzilla_tpu.ops import utf8_norm as N

pytestmark = pytest.mark.skipif(not ucd.available(),
                                reason="UCD table source unavailable")

FORMS = ("NFC", "NFD", "NFKC", "NFKD")

TRICKY = [
    "",
    "plain ascii",
    "café",  # precomposed
    "café",  # decomposed
    "q̣̇",  # reorderable marks
    "q̣̇",  # already canonically ordered
    "Å",  # ANGSTROM SIGN — singleton to Å
    "Ω",  # OHM SIGN — singleton to Ω
    "ﬃ",  # ﬃ — compat only
    "क़",  # QA — composition exclusion (stays decomposed under NFC)
    "ড়ঢ়",  # more exclusions
    "豈",  # CJK compat ideograph — singleton exclusion
    "ẛ̣",  # long s with dot above + dot below
    "̈́",  # COMBINING GREEK DIALYTIKA TONOS — decomposes to two marks
    "ཱི",  # Tibetan — non-starter decomposition
    "가",  # Hangul LV
    "각",  # Hangul LVT
    "가",  # L+V jamo → compose
    "각",  # L+V+T → compose
    "각ᆨ",  # LVT + T (no further composition)
    "́abc",  # leading combining mark
    "á́́",  # stacked same-class marks (stability)
    "אָּ",  # Hebrew points
    "\U0001d160",  # musical symbol with decomposition
    "\U0002f800",  # CJK compat ideograph supplement singleton
]


@pytest.mark.parametrize("form", FORMS)
def test_tricky_cases(form):
    for s in TRICKY:
        want = unicodedata.normalize(form, s)
        got = N.utf8_norm(s, form).decode("utf-8")
        assert got == want, (s.encode("unicode_escape"), form)
        assert N.utf8_is_normalized(s, form) == unicodedata.is_normalized(form, s)


def test_fuzz_differential(rng=None):
    random.seed(20260816)
    pools = [
        list(range(0x20, 0x7F)),
        list(range(0xC0, 0x250)),
        list(range(0x300, 0x370)),
        list(range(0x1100, 0x1120)) + list(range(0x1161, 0x1176))
        + list(range(0x11A8, 0x11C3)) + list(range(0xAC00, 0xAC30)),
        [0x212B, 0xFB03, 0x2126, 0x1E9B, 0x0958, 0x0F73, 0x0344, 0xF900],
        list(range(0x1F600, 0x1F620)),
    ]
    for _ in range(800):
        n = random.randint(0, 10)
        s = "".join(chr(random.choice(random.choice(pools))) for _ in range(n))
        for form in FORMS:
            want = unicodedata.normalize(form, s)
            got = N.utf8_norm(s, form).decode("utf-8")
            assert got == want, (s.encode("unicode_escape"), form)
            assert (N.utf8_is_normalized(s, form)
                    == unicodedata.is_normalized(form, s))


def test_find_denormalized_offsets():
    assert N.utf8_find_denormalized("abc", "NFC") == -1
    assert N.utf8_find_denormalized("café", "NFC") == -1
    # 'cafe' + combining acute: sequence starts at the 'e' (byte 3)
    assert N.utf8_find_denormalized("café", "NFC") == 3
    assert N.utf8_find_denormalized("café", "NFD") == -1
    assert N.utf8_find_denormalized("café", "NFD") == 3
    # compat char flagged only by K forms
    assert N.utf8_find_denormalized("xﬃ", "NFC") == -1
    assert N.utf8_find_denormalized("xﬃ", "NFKC") == 1


def test_idempotence_and_roundtrip():
    random.seed(3)
    pool = (list(range(0x20, 0x250)) + list(range(0x300, 0x340))
            + list(range(0xAC00, 0xAC20)))
    for _ in range(200):
        s = "".join(chr(random.choice(pool)) for _ in range(random.randint(0, 8)))
        for form in FORMS:
            once = N.utf8_norm(s, form)
            assert N.utf8_norm(once, form) == once  # idempotent
            assert N.utf8_is_normalized(once, form)


def test_norm_tables_sane():
    c = ucd.ccc()
    assert c[0x301] == 230 and c[ord("a")] == 0
    keys, vals = ucd.comp_pairs()
    assert len(keys) == len(vals) and len(keys) > 10_000
    assert (np.diff(keys.astype(np.uint64)) > 0).all()  # sorted unique
    d = dict(zip(keys.tolist(), vals.tolist()))
    assert d[(ord("e") << 21) | 0x301] == ord("é")
    assert d[(0x1100 << 21) | 0x1161] == ord("가")  # Hangul L+V
    # composition exclusion must NOT appear (0x958 → 0x915 + 0x93C)
    assert ((0x915 << 21) | 0x93C) not in d
    qc = ucd.qc_classes()
    assert qc[0x301] & 0x3 == 1  # combining acute: NFC_QC Maybe
    assert qc[0x212B] & 0x3 == 2  # ANGSTROM: NFC_QC No
    assert qc[ord("é")] & 0x3 == 0  # primary composite: Yes
    assert (qc[ord("é")] >> 2) & 0x3 == 2  # NFD_QC No
