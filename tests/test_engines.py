"""Engine-level tests: public API semantics, bucketing, symmetric mode,
device-scope matrix (the reference's pattern, ``test/szs_helpers.py:11-45``)."""

import numpy as np
import pytest

import stringzilla_tpu as szt

from . import oracles


@pytest.fixture(scope="module")
def shapes_rng():
    return np.random.default_rng(7)


def ref_matrix(queries, cands, fn):
    return np.array([[fn(q, c) for c in cands] for q in queries])


def test_levenshtein_cross_product(shapes_rng):
    engine = szt.LevenshteinDistances()
    queries = oracles.random_strings(shapes_rng, 5, 0, 40, b"abcde")
    cands = oracles.random_strings(shapes_rng, 9, 0, 70, b"abcde")
    got = engine(queries, cands)
    assert got.dtype == np.uint64
    want = ref_matrix(queries, cands, oracles.levenshtein)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_levenshtein_symmetric(shapes_rng):
    engine = szt.LevenshteinDistances()
    seqs = oracles.random_strings(shapes_rng, 7, 0, 30, b"ab")
    got = engine(seqs)
    want = ref_matrix(seqs, seqs, oracles.levenshtein)
    np.testing.assert_array_equal(got.astype(np.int64), want)
    assert (got == got.T).all()


def test_levenshtein_mixed_length_buckets(shapes_rng):
    # Strings spanning multiple dyadic buckets in one call.
    engine = szt.LevenshteinDistances()
    queries = [b"", b"a" * 3, b"b" * 70, b"c" * 200]
    cands = [b"x", b"a" * 64, b"b" * 65, b"c" * 199, b"" ]
    got = engine(queries, cands)
    want = ref_matrix(queries, cands, oracles.levenshtein)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_levenshtein_weighted_affine(shapes_rng):
    engine = szt.LevenshteinDistances(match=0, mismatch=2, open=3, extend=1)
    queries = oracles.random_strings(shapes_rng, 3, 0, 20, b"ab")
    cands = oracles.random_strings(shapes_rng, 5, 0, 20, b"ab")
    got = engine(queries, cands)
    want = ref_matrix(
        queries, cands,
        lambda q, c: oracles.score_affine(q, c, lambda x, y: 0 if x == y else 2, 3, 1, "min", False),
    )
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_levenshtein_utf8():
    engine = szt.LevenshteinDistancesUTF8()
    # é is 2 bytes but 1 codepoint; 👍 is 4 bytes 1 codepoint.
    queries = ["café", "naïve", "👍👍"]
    cands = ["cafe", "naive", "👍"]
    got = engine(queries, cands)
    byte_engine = szt.LevenshteinDistances()
    got_bytes = byte_engine([q.encode() for q in queries], [c.encode() for c in cands])
    assert got[0, 0] == 1  # é → e is one substitution in runes
    assert got_bytes[0, 0] == 2  # but two bytes differ
    assert got[2, 2] == 1  # one rune insertion
    assert got[1, 1] == 1


def _protein_costs():
    b2c = np.zeros(256, dtype=np.uint8)
    for i, ch in enumerate(b"ACGT"):
        b2c[ch] = i
    table = np.full((32, 32), -2, dtype=np.int64)
    np.fill_diagonal(table, 3)
    return b2c, table


def test_nw_and_sw_engines(shapes_rng):
    b2c, table = _protein_costs()
    sub = lambda x, y: int(table[b2c[x], b2c[y]])
    queries = oracles.random_strings(shapes_rng, 4, 1, 25, b"ACGT")
    cands = oracles.random_strings(shapes_rng, 6, 1, 25, b"ACGT")

    nw = szt.NeedlemanWunschScores(b2c, table, open=-4, extend=-1)
    got = nw(queries, cands)
    assert got.dtype == np.int64
    want = ref_matrix(queries, cands,
                      lambda q, c: oracles.score_affine(q, c, sub, -4, -1, "max", False))
    np.testing.assert_array_equal(got, want)

    sw = szt.SmithWatermanScores(b2c, table, open=-4, extend=-1)
    got = sw(queries, cands)
    want = ref_matrix(queries, cands,
                      lambda q, c: oracles.score_affine(q, c, sub, -4, -1, "max", True))
    np.testing.assert_array_equal(got, want)


def test_nw_linear_gaps(shapes_rng):
    b2c, table = _protein_costs()
    sub = lambda x, y: int(table[b2c[x], b2c[y]])
    nw = szt.NeedlemanWunschScores(b2c, table, open=-3, extend=-3)
    queries = oracles.random_strings(shapes_rng, 3, 0, 20, b"ACGT")
    cands = oracles.random_strings(shapes_rng, 5, 0, 20, b"ACGT")
    got = nw(queries, cands)
    want = ref_matrix(queries, cands,
                      lambda q, c: oracles.score_linear(q, c, sub, -3, "max", False))
    np.testing.assert_array_equal(got, want)


def test_device_scope_matrix(shapes_rng):
    """Every engine result must agree across device scopes — the reference's
    DeviceScope x shapes sweep (``test/szs_helpers.py:11-45``)."""
    import jax

    queries = oracles.random_strings(shapes_rng, 3, 0, 30, b"abc")
    cands = oracles.random_strings(shapes_rng, 400, 0, 30, b"abc")
    engine = szt.LevenshteinDistances()
    scopes = [szt.DeviceScope(), szt.DeviceScope(device_index=0)]
    if jax.device_count() >= 2:
        scopes.append(szt.DeviceScope(cpu_cores=2))
    results = [engine(queries, cands, device=s) for s in scopes]
    for r in results[1:]:
        np.testing.assert_array_equal(results[0], r)
    want = ref_matrix(queries, cands, oracles.levenshtein)
    np.testing.assert_array_equal(results[0].astype(np.int64), want)


def test_empty_inputs():
    engine = szt.LevenshteinDistances()
    assert engine([], []).shape == (0, 0)
    assert engine([b"abc"], []).shape == (1, 0)
    assert engine([], [b"abc"]).shape == (0, 1)


def test_tape_input():
    tape = szt.Tape.from_strings([b"hello", b"world"])
    engine = szt.LevenshteinDistances()
    got = engine(tape, tape)
    want = ref_matrix([b"hello", b"world"], [b"hello", b"world"], oracles.levenshtein)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_out_parameter(shapes_rng):
    engine = szt.LevenshteinDistances()
    queries = [b"abc", b"def"]
    cands = [b"abd", b"xyz", b"def"]
    out = np.zeros((2, 3), dtype=np.uint64)
    ret = engine(queries, cands, out=out)
    assert ret is out
    np.testing.assert_array_equal(out.astype(np.int64), ref_matrix(queries, cands, oracles.levenshtein))


def test_word_gather_pack_alignments():
    """The word-gather dense pack (``pack_device._gather_rows``) must be
    exact at every byte alignment of the string start within its 4-byte
    word, including rows that read past the blob's last word (the 4-byte
    tail pad keeps them in bounds)."""
    import jax.numpy as jnp

    from stringzilla_tpu.ops.pack_device import pack_on_device

    rng = np.random.default_rng(11)
    # offsets hitting alignments 0..3, lengths straddling word boundaries
    items = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8))
             for n in (1, 2, 3, 4, 5, 7, 8, 9, 13, 16, 31, 64)]
    blob = b"".join(items)
    pad = (-len(blob)) % 4
    data = jnp.asarray(np.frombuffer(blob + b"\0" * pad, np.uint8))
    offs, lens, pos = [], [], 0
    for it in items:
        offs.append(pos)
        lens.append(len(it))
        pos += len(it)
    row_len = 64  # word path (row_len % 4 == 0)
    got = np.asarray(pack_on_device(
        data, jnp.asarray(np.array(offs, np.int32)),
        jnp.asarray(np.array(lens, np.int32)), row_len=row_len, fill=0))
    for i, it in enumerate(items):
        want = np.zeros(row_len, np.int64)
        want[: len(it)] = np.frombuffer(it, np.uint8)
        np.testing.assert_array_equal(got[i].astype(np.int64), want, err_msg=str(i))


def test_class_mapped_tape_memoized():
    """Class-cost engines pre-map the device blob through the byte->class
    LUT once per (collection, LUT) pair; same LUT bytes hit the cache,
    different LUTs don't, and scores stay exact either way."""
    from stringzilla_tpu.models.similarities import _class_mapped_tape
    from stringzilla_tpu.ops.pack_device import device_tape
    from stringzilla_tpu.ops.tape import Tape

    rng = np.random.default_rng(3)
    items = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8))
             for n in (5, 17, 40)]
    dt = device_tape(Tape.from_strings(items))
    b2c = rng.integers(0, 32, 256).astype(np.uint8)
    m1 = _class_mapped_tape(dt, b2c)
    m2 = _class_mapped_tape(dt, b2c.copy())  # equal bytes -> cache hit
    assert m1 is m2
    b2c_other = (b2c + 1) % 32
    m3 = _class_mapped_tape(dt, b2c_other.astype(np.uint8))
    assert m3 is not m1
    blob = np.concatenate([np.frombuffer(it, np.uint8) for it in items])
    np.testing.assert_array_equal(
        np.asarray(m1.data)[: blob.size].astype(np.uint8), b2c[blob])
    np.testing.assert_array_equal(
        np.asarray(m3.data)[: blob.size].astype(np.uint8),
        b2c_other.astype(np.uint8)[blob])


def test_class_cost_engines_premapped_exact(shapes_rng):
    """End-to-end: NW/SW through the pre-mapped-blob pack path agree with
    the oracle for byte values spanning the full 0..255 range."""
    rng = shapes_rng
    table = rng.integers(-4, 6, (32, 32)).astype(np.int32)
    table = ((table + table.T) // 2).astype(np.int32)
    b2c = rng.integers(0, 32, 256).astype(np.uint8)
    qs = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8)) for n in (9, 33)]
    cs = [bytes(rng.integers(0, 256, int(n)).astype(np.uint8)) for n in (7, 21, 60)]
    eng = szt.NeedlemanWunschScores(byte_to_class=b2c,
                                    class_substitution_costs=table,
                                    open=-4, extend=-4)
    got = np.asarray(eng(qs, cs))
    sub = lambda x, y: int(table[b2c[x], b2c[y]])  # noqa: E731
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            want = oracles.score_linear(np.frombuffer(q, np.uint8),
                                        np.frombuffer(c, np.uint8),
                                        sub, -4, objective="max")
            assert got[i, j] == want, (i, j)


def test_engines_accept_strs_and_str_views():
    """Engines take `Strs` / `Str` items directly, as the reference bindings
    do (python/stringzillas.c:96-101 — any buffer-exporting sequence)."""
    import numpy as np
    import stringzilla_tpu as sz

    d = np.asarray(sz.LevenshteinDistances()(
        sz.Strs([b"kitten", b"flaw"]), sz.Strs([b"sitting", b"lawn"])))
    assert d[0, 0] == 3 and d[1, 1] == 2
    views = sz.Str(b"kitten sitting").split(b" ")
    d2 = np.asarray(sz.LevenshteinDistances()([views[0]], [views[1]]))
    assert d2[0, 0] == 3
    h, _ = sz.Fingerprints(ndim=64)(sz.Strs([b"some fingerprintable text"]))
    assert np.asarray(h).shape[-1] == 64


def test_engines_reject_integer_items():
    """Integer items must raise TypeError (the reference binding rejects
    non-string-likes) — never coerce through bytes(n) into zero-fill."""
    import numpy as np
    import pytest

    import stringzilla_tpu as sz

    eng = sz.LevenshteinDistances()
    with pytest.raises(TypeError):
        eng([5], [b"\x00" * 5])
    with pytest.raises(TypeError):
        eng([b"ok"], [np.int64(3)])
    with pytest.raises(TypeError):
        eng([True], [b"x"])
