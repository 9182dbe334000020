"""Transliteration of the reference's end-to-end golden test
(/root/reference/src/test/java/.../core/AbstractSolrSchemeTest.java:109-176):
two handcrafted product docs -> index -> the four golden queries with exact
hit counts, plus the binary stored-field byte-equality assert (:179-184).

Exercises reference semantics our code corpus doesn't: multi-valued field
membership (Q3, `cat` is multiValued in schema.xml:104), binary stored
fields (S5/`image`, schema.xml:143), and the case-insensitive analyzed match
of 'turbowriter' against "TurboWriter 2.3" (Q2).
"""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import products_fixture
from cascading_solr_spark.query.naive import bm25_topk_df


@pytest.fixture(scope="module")
def products(spark):
    return products_fixture(spark)


def _keyword_hits(products, q):
    return bm25_topk_df(
        products, q, k=10, content_col="name", id_col="id", round_to=None
    ).collect()


def test_default_field_keyword_search(products):
    # AbstractSolrSchemeTest.java:155-159 — q=turbowriter -> 1 hit
    hits = _keyword_hits(products, "turbowriter")
    assert [r["doc_id"] for r in hits] == [1]


def test_case_insensitive_analyzed_match(products):
    # lowercase query matches "TurboWriter 2.3" AND "Shasta 1.0" by parts
    assert [r["doc_id"] for r in _keyword_hits(products, "TURBOWRITER")] == [1]
    assert [r["doc_id"] for r in _keyword_hits(products, "shasta")] == [2]


def test_multivalued_field_membership(products):
    # :163-165 — cat:Japanese -> 1 hit; cat:Chinese -> 1 hit (field-scoped Q3)
    jp = products.filter(F.array_contains("cat", "Japanese")).collect()
    assert [r["id"] for r in jp] == [1]
    cn = products.filter(F.array_contains("cat", "Chinese")).collect()
    assert [r["id"] for r in cn] == [2]
    none = products.filter(F.array_contains("cat", "Korean")).collect()
    assert none == []


def test_zero_hit_query(products):
    # :173-175 — q=bogus -> 0 results
    assert _keyword_hits(products, "bogus") == []


def test_binary_stored_field_roundtrip(spark, products, tmp_path):
    # :160-161,179-184 — image bytes survive the sink/store round trip exactly
    out = str(tmp_path / "store")
    products.write.parquet(out)
    back = spark.read.parquet(out).orderBy("id").collect()
    expected = bytes([0, 1, 2, 3, 5])
    for r in back:
        assert bytes(r["image"]) == expected


def test_null_values_skipped(spark):
    # SolrWriter.java:65-66 — null field values are silently skipped
    df = spark.createDataFrame(
        [(1, None), (2, "Real Name")], "id int, name string"
    )
    hits = bm25_topk_df(
        df, "real name", k=10, content_col="name", id_col="id", round_to=None
    ).collect()
    assert [r["doc_id"] for r in hits] == [2]
