import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tlhop_library_spark.codecs import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**32, 2**63, 2**64 - 1],
                 dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_count_mismatch():
    with pytest.raises(ValueError):
        varint_decode(varint_encode(np.array([1, 2], dtype=np.uint64)), 3)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=500))
def test_postings_roundtrip_property(xs):
    v = np.array(sorted(xs), dtype=np.uint64)
    out = decode_postings(encode_postings(v), len(v))
    assert (out == v).all()


def test_delta_roundtrip():
    v = np.array([5, 5, 7, 100, 10**12], dtype=np.uint64)
    assert (delta_decode(delta_encode(v)) == v).all()
