"""Round-3 behaviors:

* query-string ``field:value`` parsing (the reference's own query form,
  AbstractSolrSchemeTest.java:163-165) equals the filters-dict path;
* index-side conjunctive (AND) ranked queries — a postings intersection whose
  scores equal the sum of the single-term searches;
* boundary tie-breaking in every top-k kernel is (score desc, doc_id asc),
  fuzzed against a brute-force oracle;
* block-granular keyword-filter intersection decodes only candidate blocks;
* appends are O(batch): the job never reads pre-existing postings (asserted
  by corrupting them first) and replayed batch_ids are skipped;
* caller-provided doc ids outside [0, 2^42) fail fast;
* simhash/fingerprint hash id_mode groups clones identically to dense mode.
"""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.append import append_documents
from cascading_solr_spark.indexing.build import Index, build_index
from cascading_solr_spark.query.search import parse_query, search
from cascading_solr_spark.query.wand import (
    allowed_ids,
    decode_filter_ids,
    topk_ties,
)
from cascading_solr_spark.spec import IndexSpec, IndexSpecError

KW_SPEC = IndexSpec(
    num_shards=2, salt_buckets=2, block_size=16,
    keyword_fields=("lang", "repo"),
)


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r3ix") / "ix")
    # 600 docs: lang:<v> spans several 16-posting blocks per shard, so the
    # block-granular filter intersection has blocks to skip
    corpus = synth_corpus(spark, 600, partitions=4)
    return build_index(spark, corpus, KW_SPEC, out)


# ---------------------------------------------------------------- parser


def test_parse_query_splits_keyword_tokens():
    text, fterms = parse_query("lang:es spark join", ("lang", "source"))
    assert text == "spark join"
    assert fterms == {"lang:es"}
    # unknown field stays query text; repeated fields AND together
    text, fterms = parse_query("cat:x lang:a lang:b y", ("lang",))
    assert text == "cat:x y"
    assert fterms == {"lang:a", "lang:b"}


def test_query_string_equals_filters_dict(spark, kw_index):
    via_string = search(
        spark, kw_index, "lang:python parse buffer", k=10, with_stored=False
    ).collect()
    via_dict = search(
        spark, kw_index, "parse buffer", k=10, with_stored=False,
        filters={"lang": "python"},
    ).collect()
    assert [tuple(r) for r in via_string] == [tuple(r) for r in via_dict]
    assert via_string  # non-degenerate


# ------------------------------------------------------------- AND queries


def test_and_query_index_side(spark, kw_index):
    """op='AND' == intersection of single-term result maps, scores summed.

    The two query terms are picked from the dict with PARTIAL coverage
    (30-80% of docs) so the conjunction is a strict subset of the OR."""
    n = kw_index.n_docs
    t0, t1 = [
        r["term"]
        for r in kw_index.term_dict(spark)
        .filter(
            (F.col("df") > int(0.3 * n)) & (F.col("df") < int(0.8 * n))
            & ~F.col("term").contains(":")
        )
        .orderBy("term")
        .limit(2)
        .collect()
    ]
    ra = {
        r["doc_id"]: r["score"]
        for r in search(spark, kw_index, t0, k=None, with_stored=False).collect()
    }
    rb = {
        r["doc_id"]: r["score"]
        for r in search(spark, kw_index, t1, k=None, with_stored=False).collect()
    }
    want = {d: ra[d] + rb[d] for d in ra.keys() & rb.keys()}
    got = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, kw_index, f"{t0} {t1}", k=None, op="AND",
            with_stored=False,
        ).collect()
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - s) < 1e-9
    # OR finds strictly more docs with partial-coverage terms
    n_or = search(
        spark, kw_index, f"{t0} {t1}", k=None, with_stored=False
    ).count()
    assert n_or > len(got) > 0


def test_query_string_and_operator(spark, kw_index):
    """Lucene-parser forms 'a AND b' and '+a +b' equal op='AND'."""
    base = search(
        spark, kw_index, "parse buffer", k=None, op="AND", with_stored=False
    ).collect()
    for q in ("parse AND buffer", "+parse +buffer"):
        got = search(spark, kw_index, q, k=None, with_stored=False).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in base], q
    # lowercase 'and' is a term, not an operator
    text, op = __import__(
        "cascading_solr_spark.query.search", fromlist=["query_op"]
    ).query_op("parse and buffer")
    assert op == "OR" and text == "parse and buffer"


def test_and_query_zero_hit_term_empties_result(spark, kw_index):
    got = search(
        spark, kw_index, "parse zzqxv", k=10, op="AND", with_stored=False
    ).collect()
    assert got == []


def test_and_composes_with_query_string_filter(spark, kw_index):
    got = search(
        spark, kw_index, "lang:python parse buffer", k=None, op="AND",
        with_stored=False,
    ).collect()
    baseline = search(
        spark, kw_index, "parse buffer", k=None, op="AND", with_stored=False
    ).collect()
    ids, base_ids = {r["doc_id"] for r in got}, {r["doc_id"] for r in baseline}
    assert ids <= base_ids
    langs = {
        r["lang"]
        for r in kw_index.docs(spark)
        .filter(F.col("doc_id").isin(list(ids)))
        .select("lang")
        .collect()
    }
    assert langs <= {"python"} and got


# ---------------------------------------------------------- tie-breaking


def test_topk_ties_matches_brute_force():
    for trial in range(300):
        rng = np.random.default_rng(trial)
        n = int(rng.integers(2, 40))
        scores = rng.integers(0, 4, n).astype(np.float64) / 3.0  # exact ties
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        k = int(rng.integers(1, n + 5))
        got_ids, got_scores = topk_ties(ids, scores, k)
        order = np.lexsort((got_ids, -got_scores))
        brute = np.lexsort((ids, -scores))
        assert list(got_ids[order]) == list(ids[brute][: min(k, n)]), trial


def test_duplicate_doc_tie_rank_deterministic(spark, tmp_path):
    """Byte-identical docs tie exactly in BM25; the k boundary must cut the
    tie class by ascending doc_id in every kernel mode."""
    rows = [(i, "alpha beta gamma") for i in range(20)] + [
        (100 + i, "alpha delta") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spec = IndexSpec(
        content_field="text", key_fields=("doc_id",), doc_id_field="doc_id",
        stored_fields=(), num_shards=2,
    )
    ix = build_index(spark, df, spec, str(tmp_path / "tieix"))
    for mode in ("maxscore", "taat"):
        got = [
            r["doc_id"]
            for r in search(
                spark, ix, "alpha", k=7, mode=mode, with_stored=False
            ).collect()
        ]
        # the 20 clones score identically and above the 'alpha delta' docs
        # (longer docs norm lower? no: same tf, shorter dl scores HIGHER) —
        # just assert the returned ids are the smallest of their tie class
        by_score: dict[float, list[int]] = {}
        for r in search(
            spark, ix, "alpha", k=None, mode="taat", with_stored=False
        ).collect():
            by_score.setdefault(round(r["score"], 9), []).append(r["doc_id"])
        want: list[int] = []
        for s in sorted(by_score, reverse=True):
            want.extend(sorted(by_score[s]))
        assert got == want[:7], mode


# ------------------------------------- block-granular filter intersection


def test_filter_intersection_skips_blocks(spark, kw_index):
    spec = kw_index.spec
    fterms = {"lang:python", "repo:org0/proj0"}
    pdf = (
        kw_index.postings(spark)
        .filter(F.col("term").isin(list(fterms)) & (F.col("shard") == 0))
        .toPandas()
    )
    rows = list(pdf.itertuples(index=False))
    counters: dict = {}
    got = allowed_ids(rows, fterms, spec.block_size, counters)
    # brute force: full decode of both terms, numpy intersection
    by_term = {t: [r for r in rows if r.term == t] for t in fterms}
    want = None
    for t in fterms:
        ids = decode_filter_ids(by_term[t], spec.block_size)
        want = ids if want is None else np.intersect1d(want, ids)
    assert list(got) == list(want)
    assert len(got) > 0
    # the broad term (lang:python, many blocks at block_size=16) must have
    # skipped decode of blocks holding no candidate from the selective term
    assert counters.get("filter_blocks_skipped", 0) > 0


def test_filtered_search_still_exact(spark, kw_index):
    """End-to-end: block-granular filtering returns the same docs as a
    docs-table predicate + unfiltered ranking."""
    got = search(
        spark, kw_index, "parse buffer", k=None, with_stored=False,
        filters={"lang": "python"},
    ).collect()
    unfiltered = search(
        spark, kw_index, "parse buffer", k=None, with_stored=False
    ).collect()
    python_ids = {
        r["doc_id"]
        for r in kw_index.docs(spark)
        .filter(F.col("lang") == "python")
        .select("doc_id")
        .collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in unfiltered
        if r["doc_id"] in python_ids
    }
    assert {r["doc_id"]: r["score"] for r in got} == want and got


# ------------------------------------------------------------- faceting


def test_facet_counts_matches_docs_table(spark, kw_index):
    """facet.field analogue: postings-served counts == docs-table groupBy
    over the same match set; composes with filters; unknown field raises."""
    from cascading_solr_spark.query.search import facet_counts

    got = {
        (r["value"], r["n"])
        for r in facet_counts(spark, kw_index, "parse buffer", "lang").collect()
    }
    match_ids = [
        r["doc_id"]
        for r in search(
            spark, kw_index, "parse buffer", k=None, with_stored=False
        ).collect()
    ]
    want = {
        (r["lang"], r["cnt"])
        for r in kw_index.docs(spark)
        .filter(F.col("doc_id").isin(match_ids))
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want and got
    # facets compose with an fq filter (counts restricted to the filter)
    filtered = facet_counts(
        spark, kw_index, "parse buffer", "lang", filters={"lang": "go"}
    ).collect()
    assert [(r["value"]) for r in filtered] == ["go"]
    with pytest.raises(ValueError, match="not a keyword field"):
        facet_counts(spark, kw_index, "parse", "commit")


# ------------------------------------------------------------ spellcheck


def test_suggest_terms_closest_popular_first(spark, kw_index):
    from cascading_solr_spark.query.search import suggest_terms

    rows = suggest_terms(spark, kw_index, "buffr", k=5).collect()
    assert rows and rows[0]["term"] == "buffer"  # distance 1, high df
    # ranked by (distance asc, df desc, term asc); no keyword-field terms
    key = [(r["distance"], -r["df"], r["term"]) for r in rows]
    assert key == sorted(key)
    assert all(":" not in r["term"] for r in rows)
    assert all(r["distance"] <= 2 and r["term"] != "buffr" for r in rows)


# --------------------------------------------------------- more-like-this


def test_more_like_this_finds_self_then_excludes(spark, kw_index):
    from cascading_solr_spark.query.search import more_like_this

    src = (
        kw_index.docs(spark).filter(F.col("doc_id") == 3).collect()
    )
    # stored fields don't carry content here; feed a synthetic doc's text
    text = (
        synth_corpus(spark, 10, partitions=1)
        .limit(4)
        .collect()[3]["content"]
    )
    del src
    with_self = more_like_this(spark, kw_index, text, k=5).collect()
    assert with_self  # its own terms must match plenty of docs
    top_id = with_self[0]["doc_id"]
    excluded = more_like_this(
        spark, kw_index, text, k=5, exclude_doc_id=top_id
    ).collect()
    assert all(r["doc_id"] != top_id for r in excluded)
    assert len(excluded) == 5
    # rank order is (score desc, doc_id asc)
    key = [(-r["score"], r["doc_id"]) for r in excluded]
    assert key == sorted(key)


# ----------------------------------------------------- O(batch) appends


def test_append_reads_no_existing_postings(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_corpus(spark, 100, partitions=2).write.parquet(corpus_dir)
    full = spark.read.parquet(corpus_dir)
    part_a = full.filter(F.crc32(F.col("path")) % 2 == 0)
    part_b = full.filter(F.crc32(F.col("path")) % 2 == 1)
    spec = IndexSpec(num_shards=2, salt_buckets=2)
    ix_dir = str(tmp_path / "ix")
    build_index(spark, part_a, spec, ix_dir)

    # corrupt every pre-existing postings file: ANY read of them now throws,
    # so a successful append proves per-batch cost never touches them
    files = glob.glob(os.path.join(ix_dir, "postings", "shard=*", "*.parquet"))
    assert files
    for f in files:
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    ix = append_documents(spark, ix_dir, part_b)
    assert ix.n_docs == 100

    # global dict still folds to the exact union df (dict segments are
    # derived from the batch rows, not from a postings re-scan)
    oracle = build_index(spark, full, spec, str(tmp_path / "oracle"))
    got = {r["term"]: r["df"] for r in ix.term_dict(spark).collect()}
    want = {r["term"]: r["df"] for r in oracle.term_dict(spark).collect()}
    assert got == want
    assert abs(ix.avgdl - oracle.avgdl) < 1e-9


def test_append_batch_id_idempotent(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    synth_corpus(spark, 60, partitions=2).write.parquet(corpus_dir)
    full = spark.read.parquet(corpus_dir)
    part_a = full.filter(F.crc32(F.col("path")) % 2 == 0)
    part_b = full.filter(F.crc32(F.col("path")) % 2 == 1)
    spec = IndexSpec(num_shards=2, salt_buckets=2)
    ix_dir = str(tmp_path / "ix")
    build_index(spark, part_a, spec, ix_dir)
    ix1 = append_documents(spark, ix_dir, part_b, batch_id="epoch-7")
    n_rows = ix1.postings(spark).count()
    n_docs_rows = ix1.docs(spark).count()
    # replay of a committed batch id is a no-op
    ix2 = append_documents(spark, ix_dir, part_b, batch_id="epoch-7")
    assert ix2.n_docs == ix1.n_docs
    assert ix2.postings(spark).count() == n_rows
    assert ix2.docs(spark).count() == n_docs_rows


# ------------------------------------------------------- doc id range


def test_doc_id_out_of_range_fails_fast(spark, tmp_path):
    rows = [(0, "some text"), (1 << 42, "other text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spec = IndexSpec(
        content_field="text", key_fields=("doc_id",), doc_id_field="doc_id",
        stored_fields=(), num_shards=2,
    )
    with pytest.raises(IndexSpecError, match="doc ids must be in"):
        build_index(spark, df, spec, str(tmp_path / "ix"))


# ------------------------------------- hash id_mode: simhash/fingerprint


@pytest.fixture(scope="module")
def clone_docs(spark):
    base = synth_corpus(spark, 60, partitions=2).selectExpr(
        "cast(crc32(commit) as long) as doc_id", "content as text"
    )
    clones = base.limit(10).select(
        (F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text"
    )
    return base.union(clones).persist()


def test_simhash_hash_mode_matches_dense_on_clones(spark, clone_docs):
    """Identical docs get identical signatures under ANY id assignment, so
    the hamming-0 pair set is mode-invariant (hamming>=1 pairs are
    coincidences of the id space and legitimately differ across modes; at 16
    bits even hamming-0 birthday collisions appear, so the cross-mode check
    runs at 32 bits where coincidence probability is ~2^-22)."""
    from cascading_solr_spark.operators import dedup

    def zero_pairs(id_mode: str) -> list[tuple]:
        return sorted(
            map(
                tuple,
                dedup.simhash_near_pairs(
                    clone_docs, "text", max_hamming=1, bits=32,
                    id_mode=id_mode,
                )
                .filter(F.col("hamming") == 0)
                .select("doc_a", "doc_b")
                .collect(),
            )
        )

    dense, hashed = zero_pairs("dense"), zero_pairs("hash")
    assert dense == hashed
    assert len(dense) >= 10  # the clone pairs at hamming 0


def test_fingerprint_hash_mode_same_groups(spark, clone_docs):
    from cascading_solr_spark.operators import textstats

    def groups(id_mode: str) -> set[frozenset]:
        rows = textstats.fingerprint(
            clone_docs, "text", id_mode=id_mode
        ).collect()
        by_fp: dict[int, set] = {}
        for r in rows:
            by_fp.setdefault(r["fingerprint"], set()).add(r["doc_id"])
        return {frozenset(v) for v in by_fp.values() if len(v) > 1}

    dense, hashed = groups("dense"), groups("hash")
    assert dense == hashed
    assert len(dense) >= 10  # each clone pairs with its original
