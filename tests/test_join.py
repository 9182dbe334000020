"""{!join from=A to=B} — Solr's JoinQParserPlugin (standard on every
SearchHandler of the embedded Solr the reference targets; Lucene JoinUtil).

Semantics: docs whose ``B`` value equals some ``A`` value of a doc matching
the inner query.  The engine runs it as one distributed value-join (inner
match set -> pruned from-values -> semi-join on value equality) — checked
here against a driver-side naive recomputation, plus the fq composition
(join restricts candidates, BM25 stats stay global) and the constant-score
main-query form.
"""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import (
    join_match_ids,
    match_ids,
    search,
    search_joined,
)
from cascading_solr_spark.spec import IndexSpec

JN_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("repo", "path", "lang"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jnix") / "ix")
    return build_index(
        spark, synth_corpus(spark, 300, partitions=4), JN_SPEC, out
    )


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def _naive_join(spark, ix, inner_query, from_field, to_field):
    inner = _ids(match_ids(spark, ix, inner_query, op="AND"))
    rows = ix.docs(spark).select("doc_id", from_field, to_field).collect()
    vals = {r[from_field] for r in rows if r["doc_id"] in inner}
    vals.discard(None)
    return {r["doc_id"] for r in rows if r[to_field] in vals}


def test_join_ids_match_naive(spark, ix):
    got = _ids(join_match_ids(spark, ix, "buffer321", "repo", "repo", op="AND"))
    want = _naive_join(spark, ix, "buffer321", "repo", "repo")
    assert got == want
    inner = _ids(match_ids(spark, ix, "buffer321", op="AND"))
    # non-vacuous: the join expands past the inner set but not to all docs
    assert inner < got < _ids(ix.docs(spark).select("doc_id"))


def test_join_cross_field(spark, ix):
    """from != to: repo-values of matches looked up in the path field —
    legal (no hits expected: paths are never repo names), exercises the
    asymmetric shape."""
    got = _ids(join_match_ids(spark, ix, "buffer321", "repo", "path", op="AND"))
    assert got == _naive_join(spark, ix, "buffer321", "repo", "path")


def test_join_fq_keeps_global_scores(spark, ix):
    """q=<ranked> fq={!join ...}: surviving docs keep their UNfiltered BM25
    scores (fq semantics), and the survivor set is exactly the
    intersection."""
    q = "parse buffer"
    plain = {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, q, k=None, with_stored=False).collect()
    }
    allowed = _naive_join(spark, ix, "buffer321", "repo", "repo")
    got = {
        r["doc_id"]: r["score"]
        for r in search_joined(
            spark, ix, q, "buffer321", "repo", "repo", k=None, inner_op="AND"
        ).collect()
    }
    assert set(got) == set(plain) & allowed
    for d, s in got.items():
        assert s == pytest.approx(plain[d])


def test_join_topk_is_head_of_full(spark, ix):
    full = search_joined(
        spark, ix, "parse buffer", "buffer321", "repo", "repo", k=None, inner_op="AND"
    ).collect()
    ordered = sorted(
        ((r["doc_id"], r["score"]) for r in full),
        key=lambda x: (-x[1], x[0]),
    )
    top = search_joined(
        spark, ix, "parse buffer", "buffer321", "repo", "repo", k=5, inner_op="AND"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in top] == ordered[:5]


def test_join_main_query_constant_score(spark, ix):
    got = search_joined(
        spark, ix, "*:*", "buffer321", "repo", "repo", k=None, inner_op="AND"
    ).collect()
    assert {r["doc_id"] for r in got} == _naive_join(
        spark, ix, "buffer321", "repo", "repo"
    )
    assert {r["score"] for r in got} == {1.0}


def test_join_rejects_unstored_field(spark, ix):
    with pytest.raises(ValueError, match="not stored"):
        join_match_ids(spark, ix, "buffer321", "content", "repo")
