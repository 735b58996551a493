"""Vectorized codec fast path: bit-parity with the scalar codecs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, strategies as st

from bravo_spark.codecs import flink as fc
from bravo_spark.codecs import vectorized as vz


@given(
    st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=50),
    st.sampled_from([128, 4096]),
)
def test_int_encode_parity(keys, maxp):
    fast = vz.encode_kv_fixed(keys, [0] * len(keys), fc.INT, fc.INT, maxp)
    for i, k in enumerate(keys):
        assert fast[0][i] == fc.encode_key_ns(k, fc.INT, maxp)


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=50)
)
def test_long_encode_parity(keys):
    fast = vz.encode_kv_fixed(keys, [0] * len(keys), fc.LONG, fc.LONG, 128)
    for i, k in enumerate(keys):
        assert fast[0][i] == fc.encode_key_ns(k, fc.LONG, 128)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=50,
    ),
    st.booleans(),
)
def test_decode_roundtrip_with_ttl(pairs, ttl):
    keys = [p[0] for p in pairs]
    vals = [p[1] for p in pairs]
    kns = [fc.encode_key_ns(k, fc.INT, 128) for k in keys]
    ts = 99 if ttl else None
    raw = [fc.encode_value_state(v, fc.DOUBLE, ttl_ts=ts) for v in vals]
    dec = vz.decode_kv_fixed(kns, raw, fc.INT, fc.DOUBLE, 128, ttl=ttl)
    assert list(dec[0]) == keys
    assert list(dec[1]) == vals


def test_ragged_input_falls_back():
    # a string-keyed row mixed in -> lengths differ -> fast path declines
    kns = [fc.encode_key_ns(1, fc.INT, 128), fc.encode_key_ns("ab", fc.STRING, 128)]
    raw = [fc.encode_value_state(1, fc.INT)] * 2
    assert vz.decode_kv_fixed(kns, raw, fc.INT, fc.INT, 128) is None


def test_non_fixed_codecs_decline():
    assert (
        vz.encode_kv_fixed([1], ["x"], fc.INT, fc.STRING, 128) is None
    )
    assert not vz.is_fixed(fc.STRING)


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=200))
def test_vector_murmur_parity(codes):
    from bravo_spark.codecs import hashes as kh

    arr = np.array(codes, dtype=np.int64).astype(np.uint64).astype(np.uint32)
    got = vz.vector_murmur(arr)
    for c, g in zip(codes, got):
        assert kh.flink_murmur_hash(c) == g
