"""Compare domain tests — batch equal/order vs Python byte comparisons."""

import numpy as np

from stringzilla_tpu.ops.compare import batch_equal, batch_order, equal, order


def test_scalar():
    assert equal(b"abc", "abc")
    assert not equal(b"abc", b"abd")
    assert order(b"abc", b"abd") == -1
    assert order(b"abd", b"abc") == 1
    assert order(b"abc", b"abc") == 0
    assert order(b"ab", b"abc") == -1  # prefix orders first


def test_batch(rng):
    a = [bytes(rng.integers(97, 100, rng.integers(0, 12)).astype(np.uint8))
         for _ in range(500)]
    b = [bytes(rng.integers(97, 100, rng.integers(0, 12)).astype(np.uint8))
         for _ in range(500)]
    b[10] = a[10]
    b[20] = a[20] + b"x"
    eq = batch_equal(a, b)
    od = batch_order(a, b)
    for i in range(500):
        assert eq[i] == (a[i] == b[i]), i
        exp = -1 if a[i] < b[i] else (0 if a[i] == b[i] else 1)
        assert od[i] == exp, (i, a[i], b[i])


def test_batch_long_strings(rng):
    a = [bytes(rng.integers(97, 99, 50).astype(np.uint8)) for _ in range(50)]
    b = [x[:-1] + bytes([x[-1] ^ 1]) for x in a]
    assert not batch_equal(a, b).any()
    assert batch_equal(a, list(a)).all()
