"""Arrow C data interface: zero-copy export + producer import, validated
against pyarrow (the reference exposes the same PyCapsule protocol on Strs,
``python/stringzilla.c:15,8537``)."""

import numpy as np
import pytest

import stringzilla_tpu as szt
from stringzilla_tpu.ops.tape import Tape

pa = pytest.importorskip("pyarrow")

ITEMS = [b"hello", b"", b"world", bytes(range(256)), b"x" * 1000]


def test_tape_export_roundtrip():
    tape = Tape.from_strings(ITEMS)
    arr = pa.array(tape)  # consumes __arrow_c_array__
    assert arr.type == pa.large_binary()
    assert arr.to_pylist() == ITEMS


def test_strs_export_zero_copy_views():
    strs = szt.Strs(ITEMS)
    arr = pa.array(strs)
    assert arr.to_pylist() == ITEMS
    # non-contiguous selection falls back to a re-taped copy
    sub = strs[::2]
    assert pa.array(sub).to_pylist() == ITEMS[::2]


def test_import_from_pyarrow_binary_and_utf8():
    for a in (pa.array(ITEMS, type=pa.binary()),
              pa.array(ITEMS, type=pa.large_binary()),
              pa.array(["héllo", "", "wörld"], type=pa.string()),
              pa.array(["héllo", "", "wörld"], type=pa.large_string())):
        tape = Tape.from_arrow(a)
        want = [v if isinstance(v, bytes) else v.encode()
                for v in a.to_pylist()]
        got = [bytes(np.asarray(tape.data[int(tape.offsets[i]):
                                          int(tape.offsets[i + 1])]))
               for i in range(len(tape))]
        assert got == want


def test_import_sliced_array():
    a = pa.array(ITEMS, type=pa.binary()).slice(1, 3)
    tape = Tape.from_arrow(a)
    assert len(tape) == 3
    got = [bytes(np.asarray(tape.data[int(tape.offsets[i]):
                                      int(tape.offsets[i + 1])]))
           for i in range(3)]
    assert got == ITEMS[1:4]


def test_import_rejects_nulls():
    a = pa.array([b"a", None, b"b"], type=pa.binary())
    with pytest.raises(ValueError):
        Tape.from_arrow(a)


def test_strs_constructor_accepts_arrow():
    a = pa.array(ITEMS, type=pa.binary())
    strs = szt.Strs(a)
    assert strs.to_list() == ITEMS
    # and the engines consume the result directly
    d = szt.LevenshteinDistances()(strs[:2].to_list(), strs[2:3].to_list())
    assert d.shape == (2, 1)


def test_export_release_unpins():
    from stringzilla_tpu.models import arrow as A

    before = len(A._EXPORTS)
    tape = Tape.from_strings([b"abc", b"def"])
    arr = pa.array(tape)
    del arr
    import gc

    gc.collect()
    assert len(A._EXPORTS) == before  # consumer released both structs
