"""Compaction (optimize analogue): posting content and query results are
invariant under compact_index; file count per shard collapses to one; the
publish is a crash-safe generation swap (meta.json pointer flip)."""

import glob

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.indexing.compact import compact_index
from cascading_solr_spark.query.search import search
from cascading_solr_spark.spec import IndexSpec

POSTING_COLS = ["shard", "term", "salt", "n_docs", "doc_ids", "tfs", "dls"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cx") / "ix")
    corpus = synth_corpus(spark, 150, partitions=4)
    ix = build_index(
        spark, corpus, IndexSpec(num_shards=3, salt_buckets=2), out
    )
    before = search(spark, ix, "parse buffer retry", k=10, with_stored=False).collect()
    postings_before = sorted(
        map(tuple, ix.postings(spark).select(*POSTING_COLS).collect())
    )
    compacted = compact_index(spark, ix)
    return compacted, before, postings_before


def test_compact_preserves_postings_and_results(spark, built):
    ix, before, postings_before = built
    postings_after = sorted(
        map(tuple, ix.postings(spark).select(*POSTING_COLS).collect())
    )
    assert postings_after == postings_before
    after = search(spark, ix, "parse buffer retry", k=10, with_stored=False).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]


def test_compact_generation_swap(spark, built):
    ix, _, _ = built
    # new generation dir published via the meta pointer; the REPLACED
    # generation is kept one cycle (read-while-compact: handles loaded
    # before the flip keep working) and GC'd by the NEXT compaction
    assert ix.postings_dirname == "postings.gen1"
    assert glob.glob(f"{ix.path}/postings/shard=*")
    # lineage rebuilt from the compacted rows
    lineage = {r["shard"]: r for r in ix.lineage(spark).collect()}
    assert set(lineage) == {0, 1, 2}
    terms = ix.postings(spark).groupBy("shard").count().collect()
    for r in terms:
        assert lineage[r["shard"]]["terms"] == r["count"]


def test_recompact_gc_keeps_one_prior_generation(spark, built):
    ix, before, _ = built
    stale_handle = ix  # loaded BEFORE the next compaction flips the pointer
    again = compact_index(spark, ix)
    assert again.postings_dirname == "postings.gen2"
    # two generations back ("postings") is GC'd; gen1 survives one cycle
    assert not glob.glob(f"{again.path}/postings/shard=*")
    assert glob.glob(f"{again.path}/postings.gen1/shard=*")
    # the stale handle still answers queries (its generation was retained)
    res = search(
        spark, stale_handle, "parse buffer retry", k=10, with_stored=False
    ).collect()
    assert [tuple(r) for r in res] == [tuple(r) for r in before]


def test_compact_one_file_per_shard(spark, built):
    ix, _, _ = built
    for shard_dir in glob.glob(f"{ix.postings_path}/shard=*"):
        files = [f for f in glob.glob(f"{shard_dir}/*.parquet")]
        assert len(files) == 1, shard_dir
    # still term-sorted after compaction
    pdf = ix.postings(spark).filter(F.col("shard") == 0).select("term").toPandas()
    terms = pdf["term"].tolist()
    assert terms == sorted(terms)
