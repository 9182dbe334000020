"""Round-5d behaviors: the remaining /browse-configured surface.

* q.alt=*:* match-all (solrconfig.xml:879): every doc at constant score
  1.0 in doc_id order, composing with fq filters, paging, stored fetch,
  and facet counting (the /browse landing page is exactly
  q.alt=*:* + facets);
* multi-field highlighting (solrconfig.xml:918-931): hl.fl over several
  stored fields with per-field fragsize (0 = whole field) and
  alternateField fallback;
* multi-collation spellcheck (solrconfig.xml:934-941): maxCollations /
  maxCollationTries / alternativeTermCount + maxResultsForSuggest.
"""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.analyzer import tokenize
from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import (
    facet_counts,
    highlight_fields,
    match_ids,
    search,
    spellcheck_collate,
    spellcheck_collations,
)
from cascading_solr_spark.spec import IndexSpec

R5D_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("repo", "path", "lang", "content"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5dix") / "ix")
    return build_index(spark, synth_corpus(spark, 300, partitions=4), R5D_SPEC, out)


@pytest.fixture(scope="module")
def pdf(spark):
    # doc_id = global sort rank over the default key_fields -> sorting by
    # (repo, path, commit) makes the row position the doc_id
    return (
        synth_corpus(spark, 300, partitions=4)
        .toPandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------- q.alt = *:*


def test_match_all_returns_every_doc(spark, ix, pdf):
    assert match_ids(spark, ix, "*:*").count() == len(pdf)
    rows = search(spark, ix, "*:*", k=5, with_stored=False).collect()
    assert [int(r["doc_id"]) for r in rows] == [0, 1, 2, 3, 4]
    assert all(float(r["score"]) == 1.0 for r in rows)


def test_match_all_with_filters_and_paging(spark, ix, pdf):
    n_py = int((pdf["lang"] == "python").sum())
    assert (
        match_ids(spark, ix, "*:*", filters={"lang": "python"}).count()
        == n_py
    )
    page1 = search(
        spark, ix, "*:*", k=3, filters={"lang": "python"}, with_stored=False
    ).collect()
    page2 = search(
        spark, ix, "*:*", k=3, start=3, filters={"lang": "python"},
        with_stored=False,
    ).collect()
    both = [int(r["doc_id"]) for r in page1 + page2]
    assert both == sorted(both) and len(set(both)) == 6


def test_match_all_stored_and_facets(spark, ix, pdf):
    row = search(spark, ix, "*:*", k=1).collect()[0]
    assert row["repo"] is not None and float(row["score"]) == 1.0
    got = {
        r["value"]: int(r["n"])
        for r in facet_counts(spark, ix, "*:*", "lang").collect()
    }
    exp = pdf["lang"].value_counts().to_dict()
    assert got == exp


# -------------------------------------------------- multi-field highlight


def test_highlight_fields_long_rows(spark, ix):
    out = highlight_fields(
        spark, ix, "parse buffer", ["content", "path"], k=5,
        field_params={"path": {"fragsize": 0}},
    ).collect()
    assert len(out) == 10  # k docs x 2 fields
    by_field = {}
    for r in out:
        by_field.setdefault(r["field"], []).append(r)
    # content fragments wrap the earliest term
    assert all(
        "<em>" in r["snippet"] for r in by_field["content"]
    )
    # fragsize=0 on path: the WHOLE path with the match wrapped, when the
    # path contains a query term
    for r in by_field["path"]:
        if r["term"]:
            assert r["snippet"].replace("<em>", "").replace("</em>", "") \
                in {r["snippet"].replace("<em>", "").replace("</em>", "")}
            assert "<em>" in r["snippet"]


def test_highlight_fields_whole_field_roundtrip(spark, ix, pdf):
    out = highlight_fields(
        spark, ix, "parse", ["path"], k=10,
        field_params={"path": {"fragsize": 0}},
    ).collect()
    paths = dict(zip(pdf.index, pdf["path"]))
    hit = 0
    for r in out:
        if r["term"] == "parse":
            bare = r["snippet"].replace("<em>", "").replace("</em>", "")
            assert bare == paths[int(r["doc_id"])]
            hit += 1
    assert hit > 0


def test_highlight_fields_alternate_field_fallback(spark, ix, pdf):
    # query term that exists in content but never in any path -> the path
    # rows fall back to the alternate field's head, unhighlighted
    tok_paths = {t for p in pdf["path"] for t in tokenize(p)}
    assert "return" not in tok_paths
    out = highlight_fields(
        spark, ix, "return", ["path"], k=5,
        field_params={
            "path": {"alternate_field": "repo", "max_alternate_length": 4}
        },
    ).collect()
    assert out
    repos = set(pdf["repo"].str[:4])
    for r in out:
        assert r["term"] == ""
        assert r["snippet"] in repos


def test_highlight_fields_requires_stored(spark, ix):
    with pytest.raises(ValueError, match="stored"):
        highlight_fields(spark, ix, "parse", ["commit"])


# ------------------------------------------------- multi-collation check


def test_collations_match_single_collate_best(spark, ix):
    one = spellcheck_collate(spark, ix, "parze bufer").collect()[0]
    many = spellcheck_collations(
        spark, ix, "parze bufer", max_collations=3, max_tries=5
    ).collect()
    assert 1 <= len(many) <= 3
    best = many[0]
    assert best["collation"] == one["collation"]
    assert int(best["hits"]) == int(one["hits"])
    # ordered by hits desc
    hits = [int(r["hits"]) for r in many]
    assert hits == sorted(hits, reverse=True)
    assert all(int(r["hits"]) > 0 for r in many)


def test_collations_tries_are_bounded_and_distinct(spark, ix):
    many = spellcheck_collations(
        spark, ix, "parze bufer streem", max_collations=5, max_tries=4
    ).collect()
    assert len(many) <= 4
    colls = [r["collation"] for r in many]
    assert len(set(colls)) == len(colls)


def test_collations_known_terms_not_rewritten(spark, ix):
    many = spellcheck_collations(spark, ix, "parse bufer").collect()
    for r in many:
        assert r["collation"].split()[0] == "parse"


def test_collations_alternative_terms_engage_when_starved(spark, ix):
    # all terms known, but the pair is rare/impossible under AND -> with
    # alternativeTermCount the engine may rewrite KNOWN terms too
    out = spellcheck_collations(
        spark, ix, "parse", alternative_term_count=2,
        max_results_for_suggest=10**9,  # force the starved branch
    ).collect()
    assert out  # returns ranked alternatives incl. the original term
    colls = [r["collation"] for r in out]
    assert "parse" in colls  # the known original survives as a candidate
    assert all(int(r["hits"]) > 0 for r in out)


def test_collations_no_misspelling_passthrough(spark, ix):
    out = spellcheck_collations(spark, ix, "parse buffer").collect()
    assert len(out) == 1
    assert out[0]["collation"] == "parse buffer"
    assert int(out[0]["hits"]) == match_ids(
        spark, ix, "parse buffer"
    ).count()
