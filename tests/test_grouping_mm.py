"""Result grouping / field collapse + eDisMax minimum-should-match.

Grouping mirrors Solr's ``group=true&group.field=F&group.limit=N`` defaults
(docs rank by the main sort within groups; groups rank by their head doc;
per-group numFound).  ``min_match`` mirrors eDisMax ``mm`` — a distinct-term
match-count floor under OR, served index-side by the conjunctive-count
kernel.
"""

import random

import pytest

from cascading_solr_spark.analyzer import tokenize
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import (
    _min_match_count,
    search,
    search_grouped,
)
from cascading_solr_spark.spec import IndexSpec

VOCAB = ["spark", "join", "merge", "sort", "stream", "data", "a", "b"]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rng = random.Random(5)
    rows = [
        (
            d,
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 30))),
            rng.choice(["en", "es", "fr", "de"]),
        )
        for d in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    spec = IndexSpec(
        content_field="text", key_fields=("doc_id",), stored_fields=("lang",),
        keyword_fields=("lang",), doc_id_field="doc_id", num_shards=4,
        block_size=8,
    )
    ix = build_index(
        spark, df, spec, str(tmp_path_factory.mktemp("grp") / "ix")
    )
    full = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, ix, "merge sort stream", k=None, with_stored=False
        ).collect()
    }
    return rows, ix, full


def test_min_match_spec_parsing():
    assert _min_match_count(2, 4) == 2
    assert _min_match_count("75%", 4) == 3   # Solr rounds down
    assert _min_match_count("66%", 3) == 1
    assert _min_match_count("67%", 3) == 2
    assert _min_match_count(99, 4) == 4      # clamped
    assert _min_match_count(0, 4) == 1


@pytest.mark.parametrize(
    "n,spec", [(2, 2), (2, "67%"), (3, "100%"), (3, 3)]
)
def test_min_match_matches_bruteforce(spark, corpus, n, spec):
    rows, ix, full = corpus
    got = {
        (r["doc_id"], round(r["score"], 6))
        for r in search(
            spark, ix, "merge sort stream", k=None, with_stored=False,
            min_match=spec,
        ).collect()
    }
    want = set()
    for d, t, _ in rows:
        toks = set(tokenize(t))
        if sum(1 for x in ("merge", "sort", "stream") if x in toks) >= n:
            want.add((d, round(full[d], 6)))
    assert got == want and got  # non-vacuous


def test_min_match_all_terms_equals_and(spark, corpus):
    rows, ix, _ = corpus
    a = search(
        spark, ix, "merge sort stream", k=None, with_stored=False,
        min_match=3,
    ).collect()
    b = search(
        spark, ix, "merge sort stream", k=None, with_stored=False, op="AND"
    ).collect()
    assert {(r["doc_id"], r["score"]) for r in a} == {
        (r["doc_id"], r["score"]) for r in b
    }


def _grouped_oracle(rows, full, group_limit, k_groups):
    bylang: dict[str, list] = {}
    for d, s in full.items():
        bylang.setdefault(rows[d][2], []).append((d, s))
    heads = []
    for lg, docs in bylang.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        heads.append((lg, docs))
    heads.sort(key=lambda x: (-x[1][0][1], x[1][0][0]))
    if k_groups is not None:
        heads = heads[:k_groups]
    return [
        (lg, len(docs), i, d, round(s, 6))
        for lg, docs in heads
        for i, (d, s) in enumerate(docs[:group_limit], 1)
    ]


@pytest.mark.parametrize(
    "group_limit,k_groups", [(2, 3), (1, None), (3, 2)]
)
def test_grouped_matches_bruteforce(spark, corpus, group_limit, k_groups):
    rows, ix, full = corpus
    got = [
        (r["group"], r["group_hits"], r["group_rank"], r["doc_id"],
         round(r["score"], 6))
        for r in search_grouped(
            spark, ix, "merge sort stream", "lang",
            group_limit=group_limit, k_groups=k_groups,
        ).collect()
    ]
    assert got == _grouped_oracle(rows, full, group_limit, k_groups)


def test_facet_limit_mincount_sort(spark, corpus):
    """facet.limit / facet.mincount / facet.sort analogues on facet.field."""
    from cascading_solr_spark.query.search import facet_counts

    rows, ix, full = corpus
    base = facet_counts(spark, ix, "merge sort stream", "lang").collect()
    counts = [(r["value"], r["n"]) for r in base]
    assert counts == sorted(counts, key=lambda x: (-x[1], x[0]))
    top2 = facet_counts(
        spark, ix, "merge sort stream", "lang", limit=2
    ).collect()
    assert [(r["value"], r["n"]) for r in top2] == counts[:2]
    thresh = counts[1][1]
    mc = facet_counts(
        spark, ix, "merge sort stream", "lang", mincount=thresh
    ).collect()
    assert [(r["value"], r["n"]) for r in mc] == [
        c for c in counts if c[1] >= thresh
    ]
    idx = facet_counts(
        spark, ix, "merge sort stream", "lang", sort="index"
    ).collect()
    assert [(r["value"], r["n"]) for r in idx] == sorted(counts)


def test_grouped_composes_with_filters(spark, corpus):
    rows, ix, _ = corpus
    res = search_grouped(
        spark, ix, "merge sort stream", "lang", group_limit=1,
        k_groups=None, filters={"lang": "es"},
    ).collect()
    assert len(res) == 1 and res[0]["group"] == "es"
