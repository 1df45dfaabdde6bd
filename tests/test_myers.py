"""Myers bit-parallel kernel vs the Wagner-Fischer oracle, plus the engine
dispatch that routes unit-cost configs to it (the reference's Myers dispatch,
``serial.hpp:2620-2720``)."""

import numpy as np
import pytest

from stringzilla_tpu.ops.myers_pallas import myers_pallas

from .oracles import levenshtein


def _pack(qs, cs, rows, cand_len):
    import jax.numpy as jnp

    nq, nc = len(qs), len(cs)
    q_t = np.full((rows, nq), -1, dtype=np.int32)
    qlens = np.zeros((nq, 1), np.int32)
    for i, s in enumerate(qs):
        q_t[: len(s), i] = np.frombuffer(s, np.uint8)
        qlens[i, 0] = len(s)
    c_t = np.zeros((cand_len, nc), np.int32)
    clens = np.zeros((1, nc), np.int32)
    for j, s in enumerate(cs):
        c_t[: len(s), j] = np.frombuffer(s, np.uint8)
        clens[0, j] = len(s)
    return (jnp.asarray(q_t), jnp.asarray(qlens), jnp.asarray(c_t),
            jnp.asarray(clens))


@pytest.mark.parametrize("rows,cand_len", [(32, 16), (64, 48), (128, 80)])
def test_myers_differential(rng, rows, cand_len):
    nq, nc = 3, 128
    qs = [bytes(rng.integers(97, 101, rng.integers(0, rows + 1)).astype(np.uint8))
          for _ in range(nq)]
    cs = [bytes(rng.integers(97, 101, rng.integers(0, cand_len + 1)).astype(np.uint8))
          for _ in range(nc)]
    out = np.asarray(myers_pallas(*_pack(qs, cs, rows, cand_len)))
    for i in range(nq):
        for j in range(nc):
            assert out[i, j] == levenshtein(qs[i], cs[j]), (qs[i], cs[j])


def test_myers_multiword_boundary(rng):
    """Lengths straddling the 32-bit word boundary exercise the carry chain."""
    qs = [b"a" * 31, b"a" * 32, b"a" * 33, b"ab" * 32]
    cs = [b"a" * 31, b"a" * 33, b"b" * 40, b"ba" * 20, b""]
    cs = cs + [bytes(rng.integers(97, 99, 64).astype(np.uint8)) for _ in range(123)]
    out = np.asarray(myers_pallas(*_pack(qs, cs, 64, 64)))
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert out[i, j] == levenshtein(q, c)


@pytest.mark.parametrize("words", [8, 32, 128])
def test_myers_high_word_counts(rng, words):
    """The engine routes queries up to 4096 chars (128 words) to this kernel;
    the carry prefix and the top-bit score test must hold at every tier."""
    rows = words * 32
    m = rows - rng.integers(0, 17)
    qs = [bytes(rng.integers(97, 100, m).astype(np.uint8)),
          bytes(rng.integers(97, 100, rows - 33).astype(np.uint8))]
    cand_len = 40
    cs = [bytes(rng.integers(97, 100, int(l)).astype(np.uint8))
          for l in rng.integers(0, cand_len + 1, size=127)]
    cs.append(qs[0][: min(len(qs[0]), cand_len)])  # near-identical candidate
    out = np.asarray(myers_pallas(*_pack(qs, cs, rows, cand_len), lane_block=128))
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert out[i, j] == levenshtein(q, c), (words, i, j)


def test_engine_routes_unit_cost_to_myers(rng):
    from stringzilla_tpu import LevenshteinDistances

    eng = LevenshteinDistances()
    assert eng._is_unit_cost
    qs = [b"kitten", b"sitting" * 8, b""]
    cs = [b"sitting", b"kitten", b"flour", b""]
    out = eng(qs, cs)
    for i, q in enumerate(qs):
        for j, c in enumerate(cs):
            assert out[i, j] == levenshtein(q, c)
    # non-unit costs must NOT route to Myers
    assert not LevenshteinDistances(mismatch=2)._is_unit_cost
    assert not LevenshteinDistances(open=2, extend=2)._is_unit_cost


def test_engine_symmetric_and_utf8():
    from stringzilla_tpu import LevenshteinDistances, LevenshteinDistancesUTF8

    seqs = [b"abcd", b"abce", b"zzzz"]
    out = LevenshteinDistances()(seqs)
    assert out.shape == (3, 3) and (out == out.T).all() and (np.diag(out) == 0).all()

    eng = LevenshteinDistancesUTF8()
    a, b = "héllo".encode(), "hello".encode()
    out = eng([a], [b])
    assert out[0, 0] == 1  # one rune substitution, not two byte edits
