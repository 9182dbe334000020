"""Index-side keyword fields (Q3/S5): untokenized exact-match terms
(StrField analogue, schema.xml:288), multi-valued membership
(schema.xml:104, SolrWriter.java:67-71 tuple-explode), null-skip
(SolrWriter.java:65-66), and composition with BM25 ranking (Solr fq
semantics: filters restrict candidates, scoring stats stay global).
Golden queries mirror AbstractSolrSchemeTest.java:163-169 (cat:Japanese)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.analyzer import analyze_query, tokenize
from cascading_solr_spark.corpus import products_fixture, synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import keyword_filter, search
from cascading_solr_spark.query.wand import maxscore_kernel
from cascading_solr_spark.spec import IndexSpec

N_DOCS = 250


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kwcorpus") / "code.parquet")
    synth_corpus(spark, N_DOCS, partitions=4).write.parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kwix") / "ix")
    spec = IndexSpec(
        num_shards=4, salt_buckets=4, block_size=16,
        keyword_fields=("lang", "repo"),
    )
    return build_index(spark, corpus, spec, out)


@pytest.fixture(scope="module")
def keyed(spark, corpus, index):
    rows = (
        index.docs(spark)
        .select("doc_id", "repo", "path", "commit", "lang")
        .join(corpus.select("repo", "path", "commit", "content"),
              ["repo", "path", "commit"])
        .select("doc_id", "lang", "content")
        .collect()
    )
    return [(r["doc_id"], r["lang"], r["content"]) for r in rows]


def oracle_filtered_bm25(keyed, query, lang, k=10, k1=1.2, b=0.75):
    """BM25 with GLOBAL stats, candidates restricted to lang (fq semantics)."""
    toks = {d: tokenize(c) for d, _, c in keyed}
    n = len(keyed)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    tfs = {d: Counter(t) for d, t in toks.items()}
    terms = analyze_query(query)
    dfreq = {
        t: sum(1 for d in tfs if tfs[d].get(t)) for t in terms
    }
    scores = {}
    for d, doc_lang, _ in keyed:
        if lang is not None and doc_lang != lang:
            continue
        s = 0.0
        for t in terms:
            cnt = tfs[d]
            if cnt.get(t) and dfreq[t]:
                idf = math.log1p((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                tf = cnt[t]
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        if s > 0.0:
            scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_keyword_terms_in_postings(spark, index):
    kw = (
        index.postings(spark)
        .filter(F.col("term").startswith("lang:"))
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"))
        .collect()
    )
    got = {r["term"]: r["df"] for r in kw}
    assert got["lang:java"] == N_DOCS // 5
    assert len(got) == 5


def test_hot_keyword_terms_are_salted(spark, index):
    # df("lang:java") = 20% of N >> hot ratio -> the keyword posting list is
    # salted like any hot term (no single reducer owns it)
    salts = (
        index.postings(spark)
        .filter(F.col("term") == "lang:java")
        .select("salt")
        .distinct()
        .count()
    )
    assert salts > 1
    assert "lang:java" in index.hot_terms


def test_keyword_filter_exact_membership(spark, index, keyed):
    got = [r["doc_id"] for r in keyword_filter(spark, index, {"lang": "go"}).collect()]
    want = sorted(d for d, lang, _ in keyed if lang == "go")
    assert got == want


def test_keyword_filter_conjunction(spark, index, corpus):
    repo = corpus.select("repo").first()["repo"]
    got = keyword_filter(
        spark, index, {"lang": "python", "repo": repo}
    ).count()
    want = corpus.filter(
        (F.col("lang") == "python") & (F.col("repo") == repo)
    ).count()
    assert got == want


@pytest.mark.parametrize("mode", ["taat", "maxscore"])
@pytest.mark.parametrize("query", ["parse buffer", "import", "readJson batch"])
def test_filtered_search_rank_identical_to_oracle(
    spark, index, keyed, mode, query
):
    expected = oracle_filtered_bm25(keyed, query, lang="java", k=10)
    got = search(
        spark, index, query, k=10, mode=mode, with_stored=False,
        filters={"lang": "java"},
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_filter_zero_hit(spark, index):
    assert (
        search(
            spark, index, "parse", k=10, with_stored=False,
            filters={"lang": "cobol"},
        ).count()
        == 0
    )


def test_pure_filter_query_with_stored(spark, index, keyed):
    res = search(spark, index, "", k=5, filters={"lang": "scala"}).collect()
    want = sorted(d for d, lang, _ in keyed if lang == "scala")[:5]
    assert [r["doc_id"] for r in res] == want
    assert all(r["lang"] == "scala" for r in res)


def test_products_fixture_roundtrip(spark, tmp_path):
    """The reference golden test through the REAL index path: multi-valued
    cat membership + analyzed name + binary stored field
    (AbstractSolrSchemeTest.java:109-184)."""
    products = products_fixture(spark)
    spec = IndexSpec(
        content_field="name", key_fields=("id",), doc_id_field="id",
        stored_fields=("name", "price", "inStock", "image"),
        keyword_fields=("cat",), num_shards=2, salt_buckets=2,
    )
    ix = build_index(spark, products, spec, str(tmp_path / "pix"))

    # q=turbowriter -> doc 1 (case-insensitive identifier split, Q2)
    hits = search(spark, ix, "turbowriter", k=10).collect()
    assert [r["doc_id"] for r in hits] == [1]
    # binary stored field survives byte-exact (:179-184)
    assert bytes(hits[0]["image"]) == bytes([0, 1, 2, 3, 5])

    # cat:Japanese -> doc 1; cat:Chinese -> doc 2; cat:Korean -> none (:163-169)
    assert [
        r["doc_id"] for r in keyword_filter(spark, ix, {"cat": "Japanese"}).collect()
    ] == [1]
    assert [
        r["doc_id"] for r in keyword_filter(spark, ix, {"cat": "Chinese"}).collect()
    ] == [2]
    assert keyword_filter(spark, ix, {"cat": "Korean"}).count() == 0

    # filter + rank composed: writer-ish query restricted to cat=Japanese
    both = search(
        spark, ix, "turbowriter shasta", k=10, with_stored=False
    ).collect()
    assert len(both) == 2
    only_jp = search(
        spark, ix, "turbowriter shasta", k=10, with_stored=False,
        filters={"cat": "Japanese"},
    ).collect()
    assert [r["doc_id"] for r in only_jp] == [1]
    # zero-hit analyzed query (:173-175)
    assert search(spark, ix, "bogus", k=10).count() == 0


def test_null_keyword_values_skipped(spark, tmp_path):
    # SolrWriter.java:65-66: null keyword values never become terms
    df = spark.createDataFrame(
        [(1, "alpha doc", "x"), (2, "beta doc", None)],
        "id int, body string, tag string",
    )
    spec = IndexSpec(
        content_field="body", key_fields=("id",), doc_id_field="id",
        stored_fields=(), keyword_fields=("tag",), num_shards=1,
    )
    ix = build_index(spark, df, spec, str(tmp_path / "nix"))
    tags = (
        ix.postings(spark).filter(F.col("term").startswith("tag:")).collect()
    )
    assert [r["term"] for r in tags] == ["tag:x"]


def test_maxscore_decode_skipping(spark, corpus, tmp_path):
    """The block-max pruning must actually SKIP decodes (not just filter
    after decoding) — counted via the kernel's in-process counters — while
    staying rank-identical to TAAT.  Built with multi-block hot posting rows
    (salt_buckets=1, tiny block_size) so per-block skipping is observable at
    test scale; at production scale every salted row holds thousands of
    blocks."""
    from cascading_solr_spark.codec import bm25_idf
    from cascading_solr_spark.query.search import _taat_kernel, term_dfs

    spec = IndexSpec(num_shards=2, salt_buckets=1, block_size=4)
    index = build_index(spark, corpus, spec, str(tmp_path / "skipix"))

    # a realistic query shape: selective (high-idf) terms + stopword-grade
    # ones — the rare terms set θ, then the hot lists get block-skipped
    rare = [
        r["term"]
        for r in index.term_dict(spark)
        .filter((F.col("df") >= 10) & (F.col("df") <= 60))
        .orderBy("term")
        .limit(2)
        .collect()
    ]
    terms = rare + ["import", "return"]
    dfs = term_dfs(spark, index, terms)
    idf = {t: bm25_idf(d, index.n_docs) for t, d in dfs.items()}
    pdf = (
        index.postings(spark)
        .filter((F.col("term").isin(terms)) & (F.col("shard") == 0))
        .toPandas()
    )
    counters: dict = {}
    kernel = maxscore_kernel(
        idf, index.avgdl, spec.k1, spec.b, k=3,
        block_size=spec.block_size, counters=counters,
    )
    out = kernel(pdf)
    assert counters.get("rows_decoded", 0) > 0
    assert counters.get("blocks_skipped", 0) > 0, counters
    # exactness: same kernel result as exhaustive TAAT on the same rows
    taat = _taat_kernel(idf, index.avgdl, spec.k1, spec.b, 3, spec.block_size)
    expected = taat(pdf)
    assert out["doc_id"].tolist() == expected["doc_id"].tolist()
    assert out["score"].tolist() == pytest.approx(
        expected["score"].tolist(), rel=1e-12
    )
