"""Codec round-trip tests (delta+varint, block maxes) — seeded randomized."""

import numpy as np
import pytest

from cascading_solr_spark.codec import (
    block_maxes,
    bm25_idf,
    bm25_tf_norm,
    decode_doc_ids,
    decode_varint,
    encode_doc_ids,
    encode_varint,
)


def test_varint_roundtrip_edges():
    for vals in [
        [],
        [0],
        [127],
        [128],
        [1 << 14, (1 << 14) - 1, (1 << 14) + 1],
        [2**63 - 1, 0, 1],
        list(range(1000)),
    ]:
        arr = np.array(vals, dtype=np.uint64)
        got = decode_varint(encode_varint(arr))
        assert got.tolist() == arr.tolist()


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        bits = int(rng.integers(1, 63))
        arr = rng.integers(0, 1 << bits, size=n).astype(np.uint64)
        got = decode_varint(encode_varint(arr), n)
        assert np.array_equal(got, arr)


def test_varint_compactness():
    # small gaps should cost ~1 byte each (Lucene VInt property)
    arr = np.ones(1000, dtype=np.uint64)
    assert len(encode_varint(arr)) == 1000


def test_doc_ids_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**12, size=3000)).astype(np.int64)
    got = decode_doc_ids(encode_doc_ids(ids), len(ids))
    assert np.array_equal(got, ids)


def test_doc_ids_must_increase():
    with pytest.raises(ValueError):
        encode_doc_ids(np.array([5, 5], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_doc_ids(np.array([5, 3], dtype=np.int64))


def test_bm25_reference_values():
    # hand-computed: idf = ln(1 + (N-df+0.5)/(df+0.5))
    assert bm25_idf(1, 2) == pytest.approx(np.log(2.0))
    # tf=1, dl=avgdl -> tf_norm = (k1+1)/(1+k1) = 1... tf*(k1+1)/(tf+k1)
    got = bm25_tf_norm(
        np.array([1]), np.array([100]), avgdl=100.0, k1=1.2, b=0.75
    )
    assert got[0] == pytest.approx(2.2 / 2.2)


def test_block_maxes_bounds():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 50, size=1000)
    dls = rng.integers(10, 500, size=1000)
    bm = block_maxes(tfs, dls, avgdl=120.0, k1=1.2, b=0.75, block_size=128)
    norms = bm25_tf_norm(tfs, dls, 120.0, 1.2, 0.75)
    assert len(bm) == 8
    for i in range(8):
        chunk = norms[i * 128 : (i + 1) * 128]
        assert bm[i] == pytest.approx(chunk.max())
        assert (chunk <= bm[i] + 1e-12).all()
