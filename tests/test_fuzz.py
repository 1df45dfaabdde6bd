"""Reproducible fuzzing across the whole engine surface — seed via
``SZ_TESTS_SEED``, iteration scaling via ``SZ_TESTS_MULTIPLIER`` (the
reference's protocol, ``CONTRIBUTING.md:183-236``). Failures print the
reproducing inputs."""

import numpy as np

from stringzilla_tpu import LevenshteinDistances, intersect
from stringzilla_tpu.ops import find as F
from stringzilla_tpu.ops.hash import hash_batch, sz_hash
from stringzilla_tpu.ops.sort import argsort_strings

from .oracles import levenshtein


def test_fuzz_levenshtein(rng, iterations):
    for trial in range(iterations(30)):
        nq = int(rng.integers(1, 5))
        nc = int(rng.integers(1, 20))
        alpha = int(rng.integers(2, 8))
        qs = [bytes(rng.integers(97, 97 + alpha, int(rng.integers(0, 200))).astype(np.uint8))
              for _ in range(nq)]
        cs = [bytes(rng.integers(97, 97 + alpha, int(rng.integers(0, 200))).astype(np.uint8))
              for _ in range(nc)]
        out = LevenshteinDistances()(qs, cs)
        for i, q in enumerate(qs):
            for j, c in enumerate(cs):
                assert out[i, j] == levenshtein(q, c), (
                    f"repro: SZ_TESTS_SEED seed, trial={trial}, q={q!r}, c={c!r}")


def test_fuzz_find(rng, iterations):
    for trial in range(iterations(200)):
        n = int(rng.integers(1, 600))
        hay = bytes(rng.integers(97, 100, n).astype(np.uint8))
        k = int(rng.integers(1, 20))
        if rng.random() < 0.6 and n >= k:
            s = int(rng.integers(0, n - k + 1))
            needle = hay[s : s + k]
        else:
            needle = bytes(rng.integers(97, 101, k).astype(np.uint8))
        assert F.find(hay, needle) == hay.find(needle), (trial, hay, needle)
        assert F.rfind(hay, needle) == hay.rfind(needle), (trial, hay, needle)


def test_fuzz_sort_hash_intersect(rng, iterations):
    for trial in range(iterations(20)):
        words = [bytes(rng.integers(97, 123, int(rng.integers(0, 16))).astype(np.uint8))
                 for _ in range(300)]
        perm = argsort_strings(words)
        assert [words[i] for i in perm] == sorted(words), trial
        h = hash_batch(words[:50], seed=trial)
        assert all(h[i] == sz_hash(w, trial) for i, w in enumerate(words[:50]))
        other = words[100:200] + [b"zz_unique"]
        ia, ib = intersect(words, other)
        assert set(words[i] for i in ia) == (set(words) & set(other))


def test_fuzz_norm(rng, iterations):
    import unicodedata

    from stringzilla_tpu.ops import utf8_norm as N

    pool = (list(range(0x20, 0x7F)) + list(range(0xC0, 0x180))
            + list(range(0x300, 0x315)) + [0x1100, 0x1161, 0x11A8, 0xAC00,
                                           0x212B, 0xFB03, 0x0344])
    for trial in range(iterations(1500)):
        n = int(rng.integers(0, 24))
        s = "".join(chr(pool[int(i)]) for i in rng.integers(0, len(pool), n))
        for form in ("NFC", "NFD", "NFKC", "NFKD"):
            want = unicodedata.normalize(form, s)
            got = N.utf8_norm(s, form).decode("utf-8")
            assert got == want, (trial, form, s.encode("unicode_escape"))
            assert (N.utf8_is_normalized(s, form)
                    == unicodedata.is_normalized(form, s)), (trial, form, s)


def test_fuzz_uncased_find(rng, iterations):
    from stringzilla_tpu.ops.utf8 import utf8_uncased_find

    pool = "abcAB ßKÉéK"
    for trial in range(iterations(1500)):
        hay = "".join(pool[int(i)] for i in
                      rng.integers(0, len(pool), int(rng.integers(0, 60))))
        nd = "".join("abß k"[int(i)] for i in
                     rng.integers(0, 5, int(rng.integers(1, 5))))
        hb = hay.encode("utf-8")
        got_off = utf8_uncased_find(hb, nd)[0]
        # oracle: fold per char, track byte offsets
        folded, offs, bpos = [], [], 0
        for ch in hay:
            for fc in ch.casefold():
                folded.append(fc)
                offs.append(bpos)
            bpos += len(ch.encode("utf-8"))
        p = "".join(folded).find(nd.casefold())
        want = -1 if p < 0 else offs[p]
        assert got_off == want, (trial, hay.encode("unicode_escape"), nd)
