"""Cross-chip ring wavefront (ppermute frontier exchange) vs DP oracles on
the virtual multi-device mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from stringzilla_tpu.parallel.ring import ring_wavefront_score

from .oracles import levenshtein, score_linear


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def test_ring_levenshtein(mesh, rng):
    for _ in range(4):
        m = int(rng.integers(1, 500))
        n = int(rng.integers(1, 500))
        a = bytes(rng.integers(97, 101, m).astype(np.uint8))
        b = bytes(rng.integers(97, 101, n).astype(np.uint8))
        assert ring_wavefront_score(a, b, mesh, block_cols=64) == levenshtein(a, b)


def test_ring_scores(mesh, rng):
    a = bytes(rng.integers(97, 101, 200).astype(np.uint8))
    b = bytes(rng.integers(97, 101, 333).astype(np.uint8))
    exp = score_linear(a, b, lambda x, y: 1 if x == y else -1, -2, objective="max")
    got = ring_wavefront_score(a, b, mesh, match=1, mismatch=-1, gap=-2,
                               objective="max", block_cols=64)
    assert got == exp


def test_ring_edges(mesh):
    assert ring_wavefront_score(b"a", b"a", mesh) == 0
    assert ring_wavefront_score(b"", b"xyz", mesh) == 3
    assert ring_wavefront_score(b"xyz", b"", mesh) == 3
