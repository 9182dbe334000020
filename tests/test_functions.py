"""Function queries — Solr's ValueSource library (solrconfig.xml:1744-1750
registers the func QParser) and the eDisMax boost params (bf / boost / bq;
the reference's /browse handler is defType=edismax, solrconfig.xml:872).

Covers: the expression parser (both renderers kept in lockstep by a
DuckDB-vs-Spark parity test), sort-by-function / {!func} main queries, and
the three edismax boost shapes, each checked against a naive recomputation
over the same corpus.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.functions import (
    FunctionParseError,
    func_column,
    func_fields,
    func_sql,
    parse_function,
)
from cascading_solr_spark.query.search import (
    match_ids,
    search,
    search_boosted,
    sort_by_function,
)
from cascading_solr_spark.spec import IndexSpec

FIELDS = {"textlen", "doclen", "lang"}

FN_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("repo", "lang", "textlen", "lat", "lon"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fnix") / "ix")
    # deterministic synthetic coordinates (the LatLonType analogue: a
    # location field stored as two numeric columns)
    corpus = (
        synth_corpus(spark, 300, partitions=4)
        .withColumn("textlen", F.length("content"))
        .withColumn(
            "lat", (F.crc32(F.col("path")) % 18000) / 100.0 - 90.0
        )
        .withColumn(
            "lon",
            (F.crc32(F.concat(F.col("repo"), F.col("path"))) % 36000) / 100.0
            - 180.0,
        )
    )
    return build_index(spark, corpus, FN_SPEC, out)


# --- parser ---------------------------------------------------------------


def test_parse_shapes():
    n = parse_function("recip(textlen,1,1000,1000)", FIELDS)
    assert n.name == "recip" and len(n.args) == 4
    assert func_fields(n) == {"textlen"}
    # field() wrapper == bare name
    assert parse_function("field(textlen)", FIELDS) == parse_function(
        "textlen", FIELDS
    )
    # negative literals
    n = parse_function("linear(textlen,-2,0.5)", FIELDS)
    assert n.args[1].args[0] == -2.0


@pytest.mark.parametrize(
    "bad",
    [
        "nosuchfunc(textlen)",
        "sub(textlen)",  # wrong arity
        "recip(textlen,1,2)",  # wrong arity
        "map(textlen,1)",  # wrong arity
        "unknownfield",
        "sum(textlen,1) trailing",
        "div(textlen,)",
    ],
)
def test_parse_errors(bad):
    with pytest.raises(FunctionParseError):
        parse_function(bad, FIELDS)


EXPRS = [
    "sum(textlen,doclen,5)",
    "sub(textlen,doclen)",
    "product(textlen,0.5)",
    "div(textlen,doclen)",
    "pow(textlen,0.5)",
    "abs(sub(doclen,textlen))",
    "sqrt(textlen)",
    "log(textlen)",
    "min(textlen,doclen)",
    "max(textlen,doclen)",
    "recip(textlen,1,1000,1000)",
    "linear(textlen,2,-3)",
    "map(textlen,0,100,1,0)",
    "map(textlen,0,100,1)",
    # doclen/textlen stand in for coordinates — parity is about the
    # renderers agreeing, not geography
    "geodist(div(textlen,10),doclen,48.85,2.35)",
]


def test_spark_duckdb_renderer_parity(spark):
    """Both renderers of every supported function agree to float precision
    on the same rows — the property the oracle checks lean on."""
    pdf = pd.DataFrame(
        {"textlen": [1.0, 37.0, 100.0, 512.0], "doclen": [4.0, 2.0, 100.0, 7.0]}
    )
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    for expr in EXPRS:
        node = parse_function(expr, FIELDS)
        got = [
            r["v"]
            for r in sdf.select(func_column(node).alias("v"))
            .orderBy("textlen")
            .collect()
        ]
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {func_sql(node)} FROM t ORDER BY textlen"
            ).fetchall()
        ]
        assert got == pytest.approx(want, rel=1e-12), expr


# --- sort by function -----------------------------------------------------


def _doc_field(spark, ix, ids):
    rows = (
        ix.docs(spark)
        .select("doc_id", "textlen")
        .filter(F.col("doc_id").isin(list(ids)))
        .collect()
    )
    return {r["doc_id"]: r["textlen"] for r in rows}


def test_sort_by_function_matches_naive(spark, ix):
    q = "parse buffer"
    got = [
        (r["doc_id"], r["value"])
        for r in sort_by_function(
            spark, ix, q, "recip(textlen,1,1000,1000)", ascending=False, k=10
        ).collect()
    ]
    ids = {r["doc_id"] for r in match_ids(spark, ix, q).collect()}
    tl = _doc_field(spark, ix, ids)
    want = sorted(
        ((d, 1000.0 / (tl[d] + 1000.0)) for d in ids),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == pytest.approx(want)
    # recip is monotone-decreasing in textlen: desc recip == asc textlen
    assert [d for d, _ in got] == sorted(ids, key=lambda d: (tl[d], d))[:10]


def test_func_main_query_match_all(spark, ix):
    """{!func} main-query form: query *:* ranks ALL live docs by value."""
    got = sort_by_function(
        spark, ix, "*:*", "product(textlen,-1)", ascending=False, k=5
    ).collect()
    n = ix.docs(spark).count()
    all_tl = _doc_field(
        spark, ix, [r["doc_id"] for r in ix.docs(spark).select("doc_id").collect()]
    )
    assert len(all_tl) == n
    want = sorted(all_tl, key=lambda d: (all_tl[d], d))[:5]
    assert [r["doc_id"] for r in got] == want


def test_sort_by_function_paged(spark, ix):
    full = sort_by_function(spark, ix, "parse", "textlen", k=20).collect()
    page2 = sort_by_function(spark, ix, "parse", "textlen", k=5, start=5).collect()
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in full[5:10]]


# --- edismax bf / boost / bq ----------------------------------------------


def _base_scores(spark, ix, q):
    return {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, q, k=None, with_stored=False).collect()
    }


def test_bf_additive_matches_naive_and_reorders(spark, ix):
    q = "parse buffer"
    base = _base_scores(spark, ix, q)
    tl = _doc_field(spark, ix, base)
    want = sorted(
        ((d, s + (tl[d] / 100.0)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in search_boosted(
            spark, ix, q, bf="div(textlen,100)", k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])
    # non-vacuous: the boost actually changes the head of the ranking
    plain = sorted(base.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in got] != [d for d, _ in plain]


def test_boost_multiplicative(spark, ix):
    q = "parse buffer"
    base = _base_scores(spark, ix, q)
    tl = _doc_field(spark, ix, base)
    want = sorted(
        ((d, s * (1000.0 / (tl[d] + 1000.0))) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in search_boosted(
            spark, ix, q, boost="recip(textlen,1,1000,1000)", k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])


def test_bq_constant_boost(spark, ix):
    q = "parse buffer"
    base = _base_scores(spark, ix, q)
    es = {r["doc_id"] for r in match_ids(spark, ix, "lang:go").collect()}
    want = sorted(
        ((d, s + (2.5 if d in es else 0.0)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in search_boosted(spark, ix, q, bq="lang:go^2.5", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])
    assert es & set(base)  # the boost clause overlaps the match set


def test_bq_multi_clause_and_combined(spark, ix):
    """Two bq clauses + a bf together; weights sum per doc."""
    q = "parse buffer"
    base = _base_scores(spark, ix, q)
    tl = _doc_field(spark, ix, base)
    es = {r["doc_id"] for r in match_ids(spark, ix, "lang:go").collect()}
    mg = {r["doc_id"] for r in match_ids(spark, ix, "merge").collect()}
    want = sorted(
        (
            (
                d,
                s
                + (2.0 if d in es else 0.0)
                + (1.0 if d in mg else 0.0)
                + tl[d] / 1000.0,
            )
            for d, s in base.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in search_boosted(
            spark, ix, q, bq="lang:go^2 merge", bf="div(textlen,1000)", k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])


def test_boosts_never_change_match_set(spark, ix):
    q = "parse buffer"
    plain = {r["doc_id"] for r in search(spark, ix, q, k=None, with_stored=False).collect()}
    boosted = {
        r["doc_id"]
        for r in search_boosted(
            spark, ix, q, bf="div(textlen,10)", bq="lang:go^9", k=None
        ).collect()
    }
    assert boosted == plain


def test_function_docs_scan_is_column_pruned(spark, ix):
    """The bf docs scan reads only (doc_id, textlen) — never content/text
    (the 100 TB property: a boost over a numeric field must not read the
    corpus text)."""
    plan = (
        search_boosted(spark, ix, "parse buffer", bf="log(textlen)", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"ReadSchema: ([^\n]*)", plan):
        schema = m.group(1)
        if "textlen" in schema:
            assert "content" not in schema and "repo" not in schema


# --- spatial: geodist / geofilt (schema.xml:684 LatLonType) -----------------


def _haversine(lat1, lon1, lat2, lon2):
    import math

    r = 6371.0087714
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(h))


def test_geodist_known_values(spark):
    """Quarter meridian: (0,0) -> (90,0) = pi/2 * R; equator quarter:
    (0,0) -> (0,90) the same."""
    import math

    sdf = spark.createDataFrame(
        [(0.0, 0.0, 90.0, 0.0), (0.0, 0.0, 0.0, 90.0)],
        "a double, b double, c double, d double",
    )
    node = parse_function("geodist(a,b,c,d)", {"a", "b", "c", "d"})
    got = [r["v"] for r in sdf.select(func_column(node).alias("v")).collect()]
    want = math.pi / 2 * 6371.0087714
    assert got == pytest.approx([want, want])
    assert got[0] == pytest.approx(_haversine(0, 0, 90, 0))


def test_sort_by_distance_matches_naive(spark, ix):
    """Solr's sort=geodist() asc — nearest docs to the query point."""
    q = "parse"
    got = [
        (r["doc_id"], r["value"])
        for r in sort_by_function(
            spark, ix, q, "geodist(lat,lon,48.85,2.35)", ascending=True, k=10
        ).collect()
    ]
    ids = {r["doc_id"] for r in match_ids(spark, ix, q).collect()}
    pts = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in ix.docs(spark)
        .select("doc_id", "lat", "lon")
        .filter(F.col("doc_id").isin(list(ids)))
        .collect()
    }
    want = sorted(
        ((d, _haversine(la, lo, 48.85, 2.35)) for d, (la, lo) in pts.items()),
        key=lambda x: (x[1], x[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [v for _, v in got] == pytest.approx([v for _, v in want])


def test_geofilt_via_doc_filter(spark, ix):
    """{!geofilt d=5000} analogue: func_sql renders SQL that Spark's own
    parser accepts, so the distance predicate rides doc_filter unchanged."""
    node = parse_function("geodist(lat,lon,48.85,2.35)", {"lat", "lon"})
    pred = f"{func_sql(node)} <= 5000"
    got = {
        r["doc_id"]
        for r in match_ids(spark, ix, "parse", doc_filter=pred).collect()
    }
    ids = {r["doc_id"] for r in match_ids(spark, ix, "parse").collect()}
    pts = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in ix.docs(spark)
        .select("doc_id", "lat", "lon")
        .filter(F.col("doc_id").isin(list(ids)))
        .collect()
    }
    want = {
        d for d, (la, lo) in pts.items()
        if _haversine(la, lo, 48.85, 2.35) <= 5000
    }
    assert got == want
    assert 0 < len(got) < len(ids)  # non-vacuous both ways
