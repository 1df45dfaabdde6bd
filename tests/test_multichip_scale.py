"""Multi-chip evidence at scale (virtual 8-device CPU mesh).

The small-shape ring/engine tests (``test_ring.py``, ``test_engines.py``)
prove collective correctness; these prove the same programs hold up at
shapes where the sharding actually matters — a >=50 K-char cross-chip ring
pair and a realistic 128x32K engine fan-out — playing the role the
reference's QEMU sweeps play for its SIMD tiers
(reference ``CONTRIBUTING.md:218-244``).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import stringzilla_tpu as sz
from stringzilla_tpu.parallel.ring import ring_wavefront_score


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def test_ring_50k_pair(mesh):
    """One 50K x 50K Levenshtein pair sharded around the mesh ring.

    Oracle-free exactness: ``b`` is ``a`` with K spaced substitutions to a
    byte absent from ``a``'s alphabet. Each edit can produce at most one
    ``$`` so distance >= K; the construction gives distance <= K; hence the
    result must equal K exactly.
    """
    rng = np.random.default_rng(7)
    n, k = 50_000, 200
    a = rng.integers(97, 123, n).astype(np.uint8)
    b = a.copy()
    b[np.sort(rng.choice(n, k, replace=False))] = ord("$")
    d = ring_wavefront_score(a.tobytes(), b.tobytes(), mesh, block_cols=2048)
    assert d == k


def test_engine_8shard_realistic(mesh):
    """128 queries x 32768 candidates through the sharded Myers engine path
    (``DeviceScope(mesh=...)`` with ndev > 1), equal to the single-device
    engine on an overlapping sub-grid."""
    rng = np.random.default_rng(3)
    qs = [bytes(rng.integers(97, 123, int(l)).astype(np.uint8))
          for l in rng.integers(8, 24, 128)]
    cs = [bytes(rng.integers(97, 123, int(l)).astype(np.uint8))
          for l in rng.integers(8, 24, 32768)]
    eng = sz.LevenshteinDistances()
    out = eng(qs, cs, device=sz.DeviceScope(mesh=mesh))
    assert out.shape == (128, 32768)
    ref = eng(qs[:16], cs[:2048])
    np.testing.assert_array_equal(out[:16, :2048], ref)


def test_engine_8shard_nw_classes(mesh):
    """Sharded class-cost NW at a wider-than-toy shape: 32 x 4096 proteins,
    equal to the single-device lane kernel on an overlap block."""
    rng = np.random.default_rng(11)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    b2c = np.zeros(256, dtype=np.uint8)
    for i, ch in enumerate(aa):
        b2c[ch] = i
    table = rng.integers(-4, 6, (32, 32)).astype(np.int32)
    np.fill_diagonal(table, 5)
    eng = sz.NeedlemanWunschScores(byte_to_class=b2c,
                                   class_substitution_costs=table,
                                   open=-3, extend=-3)
    qs = [rng.choice(aa, int(l)).tobytes() for l in rng.integers(20, 60, 32)]
    cs = [rng.choice(aa, int(l)).tobytes() for l in rng.integers(20, 60, 4096)]
    out = eng(qs, cs, device=sz.DeviceScope(mesh=mesh))
    ref = eng(qs[:8], cs[:512])
    np.testing.assert_array_equal(out[:8, :512], ref)


def test_fingerprints_8shard_with_band_keys(mesh):
    """Sharded MinHash at a realistic doc count (2048 docs over 8 shards)
    equals the single-device engine bit-for-bit, and the downstream LSH
    band keys agree — the full device-resident dedup path under sharding."""
    from stringzilla_tpu.ops.fingerprints import band_keys

    rng = np.random.default_rng(5)
    docs = [bytes(rng.integers(97, 123, int(l)).astype(np.uint8))
            for l in rng.integers(50, 220, 2048)]
    eng = sz.Fingerprints(ndim=128)
    h_sh, c_sh = eng(docs, device=sz.DeviceScope(mesh=mesh))
    h_one, c_one = eng(docs[:256])
    np.testing.assert_array_equal(h_sh[:256], h_one)
    np.testing.assert_array_equal(c_sh[:256], c_one)
    k_sh = np.asarray(band_keys(h_sh, bands=16))
    k_one = np.asarray(band_keys(h_one, bands=16))
    np.testing.assert_array_equal(k_sh[:256], k_one)
