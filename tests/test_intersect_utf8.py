"""Intersect (hash sort-merge join) and UTF-8 layer tests — differential vs
Python set ops / codecs / unicodedata, the same oracles the reference's Python
suite leans on."""

import unicodedata

import numpy as np

from stringzilla_tpu.ops import utf8 as U
from stringzilla_tpu.ops.intersect import intersect


def test_intersect_basic():
    a = [b"apple", b"banana", b"cherry", b"apple", b"date"]
    b = [b"cherry", b"apple", b"elderberry", b"cherry"]
    ia, ib = intersect(a, b)
    assert [a[i] for i in ia] == [b"apple", b"cherry"]
    assert [b[i] for i in ib] == [b"apple", b"cherry"]
    assert list(ia) == [0, 2] and list(ib) == [1, 0]
    assert intersect([], b)[0].size == 0
    assert intersect(a, [])[1].size == 0


def test_intersect_random(rng):
    A = [bytes(rng.integers(97, 105, 6).astype(np.uint8)) for _ in range(2000)]
    B = [bytes(rng.integers(97, 105, 6).astype(np.uint8)) for _ in range(2000)]
    ia, ib = intersect(A, B)
    assert set(A[i] for i in ia) == (set(A) & set(B))
    assert all(B[j] == A[i] for i, j in zip(ia, ib))
    assert len(ia) == len(set(A) & set(B))  # distinct, reported once
    # seeded: different seed, same result set
    ia2, _ = intersect(A, B, seed=123)
    assert set(ia) == set(ia2)


def test_intersect_large_device_path(rng):
    """Regression: >= 2^15 items routes key sorting to the device tier; u64
    keys must be split into u32 lanes (x64 is off — a plain jnp.argsort
    silently truncates and the merge returns ~nothing)."""
    n = 1 << 15
    A = [b"a%028d" % i for i in range(n)]
    B = [b"b%028d" % i for i in range(n)]
    common = [b"common-%023d" % i for i in range(100)]
    for k in range(100):
        A[k * 301] = common[k]
        B[k * 317] = common[k]
    ia, ib = intersect(A, B)
    assert len(ia) == 100
    assert all(A[i] == B[j] for i, j in zip(ia, ib))


def test_sorted_match_collision_runs():
    """A hash collision between distinct strings must probe the whole
    equal-key run, not a single searchsorted position."""
    from stringzilla_tpu.ops.intersect import _sorted_match

    a = np.array([5, 9, 9, 2], dtype=np.uint64)
    b = np.array([9, 7, 9, 5, 9], dtype=np.uint64)
    ia, ib = _sorted_match(a, b)
    pairs = set(zip(ia.tolist(), ib.tolist()))
    expected = {(0, 3)} | {(i, j) for i in (1, 2) for j in (0, 2, 4)}
    assert pairs == expected


def test_utf8_runes(rng):
    s = "héllo жизнь 🌍"
    b = s.encode()
    assert U.utf8_count(b) == len(s)
    assert list(U.utf8_decode(b)) == [ord(c) for c in s]
    for i in (0, 1, 5, len(s) - 1):
        assert U.utf8_seek(b, i) == len(s[:i].encode())
    assert U.utf8_seek(b, 999) == len(b)


def test_utf8_invalid_resync():
    for bad in (b"ab\xff\xfe\xc3", b"a\xe2\x82b", b"\x80\x80", b"\xf0\x9f\x8cq"):
        dec = bad.decode("utf-8", "replace")
        assert U.utf8_count(bad) == len(dec)
        assert list(U.utf8_decode(bad)) == [ord(c) for c in dec]


def test_utf8_fold_and_norm():
    assert U.utf8_fold("Straße".encode()) == b"strasse"
    assert U.utf8_fold("ﬃ".encode()) == b"ffi"
    comp = "é".encode()
    decomp = unicodedata.normalize("NFD", "é").encode()
    assert U.utf8_norm(decomp, "NFC") == comp
    assert U.utf8_norm(comp, "NFD") == decomp
    assert U.utf8_is_normalized(comp, "NFC")
    assert U.utf8_find_denormalized(comp, "NFC") == -1
    assert U.utf8_find_denormalized(b"abc" + decomp, "NFC") == 3


def test_utf8_uncased_search():
    hay = "The STRAßE was loud".encode()
    off, ln = U.utf8_uncased_find(hay, b"strasse")
    assert hay[off : off + ln] == "STRAßE".encode()
    assert U.utf8_uncased_find(b"Hello World", b"WORLD") == (6, 5)
    assert U.utf8_uncased_find(b"abc", b"zz") == (-1, 0)
    assert U.utf8_uncased_order(b"ABC", b"abc") == 0
    assert U.utf8_uncased_order(b"ABC", b"abd") == -1
    assert U.utf8_find_cased(b"123 Abc") == 4
    assert U.utf8_find_cased(b"123") == -1


def test_utf8_tokens_and_graphemes():
    assert U.utf8_newlines(b"a\nb\r\nc\rd") == [(1, 1), (3, 2), (6, 1)]
    assert [w[0] for w in U.utf8_whitespaces("a b\tc d".encode())] == [1, 3, 5]
    assert [d[0] for d in U.utf8_delimiters(b"a,b.c!d")] == [1, 3, 5]
    assert len(U.utf8_graphemes("héllo".encode())) == 5
    nfd = unicodedata.normalize("NFD", "éX").encode()
    g = U.utf8_graphemes(nfd)
    assert len(g) == 2 and g[0] == (0, 3)
    assert len(U.utf8_graphemes("🇺🇸🇫🇷".encode())) == 2  # RI pairs
    assert len(U.utf8_graphemes("👩‍🚀".encode())) == 1  # ZWJ sequence
    assert len(U.utf8_graphemes(b"a\r\nb")) == 3  # CRLF is one cluster


def test_utf8_device_validate_count(rng):
    """Fused device validation+count pass vs CPython's decoder (structural,
    overlong, surrogate, out-of-range, truncation cases + fuzz)."""
    import jax.numpy as jnp

    from stringzilla_tpu.ops.utf8_device import validate_count_device
    from stringzilla_tpu.ops.utf8 import utf8_count

    def check(buf: bytes):
        pad = max(len(buf), 1)
        arr = np.zeros(-(-pad // 128) * 128, np.uint8)
        arr[: len(buf)] = np.frombuffer(buf, np.uint8)
        valid, count = validate_count_device(jnp.asarray(arr.reshape(-1, 128)),
                                             len(buf))
        try:
            buf.decode("utf-8")
            want_valid = True
        except UnicodeDecodeError:
            want_valid = False
        assert valid == want_valid, buf
        if valid:
            assert count == utf8_count(buf), buf

    cases = [
        b"", b"plain ascii", "héllo wörld".encode(), "日本語テキスト".encode(),
        "emoji 🎉🎊".encode(), b"\x80", b"\xC0\xAF", b"\xC1\xBF",  # overlongs
        b"\xE0\x80\x80", b"\xE0\xA0\x80",  # 3-byte overlong vs minimal valid
        b"\xED\x9F\xBF", b"\xED\xA0\x80",  # below vs inside surrogates
        b"\xF0\x8F\xBF\xBF", b"\xF0\x90\x80\x80",  # 4-byte overlong vs valid
        b"\xF4\x8F\xBF\xBF", b"\xF4\x90\x80\x80",  # U+10FFFF vs above
        b"\xF5\x80\x80\x80", b"\xFF", b"ok\xC3",  # bad lead, truncation
        b"ok\xE2\x82", "ab€cd".encode()[:-1], b"\xC3\xA9" * 50,
    ]
    for buf in cases:
        check(buf)
    pool = ("xyz".encode(), "é".encode(), "€".encode(), "🎉".encode(),
            b"\xC3", b"\x80", b"\xED\xA0\x80", b"\xF4\x90\x80\x80")
    for _ in range(200):
        parts = [pool[int(i)] for i in rng.integers(0, len(pool),
                                                    int(rng.integers(0, 12)))]
        check(b"".join(parts))
