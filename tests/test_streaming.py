"""Structured Streaming extensions: windowed event aggregation (stream ==
batch result) and foreachBatch incremental index refresh (segments build and
answer queries).  The reference is batch-only (SURVEY.md §2.3) — these are
engine extensions, tested for plumbing correctness."""

import os

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import Index, build_index
from cascading_solr_spark.query.search import search
from cascading_solr_spark.spec import IndexSpec
from cascading_solr_spark.streaming.refresh import (
    incremental_index_refresh,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(os.path.join(SF, "events.parquet"))
    expected = sorted(
        map(tuple, windowed_event_counts(batch, "1 hour").collect())
    )

    events_dir = str(tmp_path / "events_dir")
    batch.write.parquet(events_dir)  # file-stream source needs a DIRECTORY
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    q = (
        windowed_event_counts(stream, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ev_out").collect()))
    assert got == expected


def _full_results(spark, ix, query):
    """Full (key -> score) result map — id-assignment-independent."""
    rows = search(spark, ix, query, k=10_000, with_stored=True).collect()
    return {
        (r["repo"], r["path"], r["commit"]): round(r["score"], 9) for r in rows
    }


@pytest.mark.parametrize("n_docs", [60])
def test_incremental_refresh_one_coherent_index(spark, tmp_path, n_docs):
    """foreachBatch appends build ONE index whose BM25 results are EXACTLY a
    from-scratch build's (global stats refresh per batch; ids never collide)."""
    corpus_dir = str(tmp_path / "stream_corpus")
    synth_corpus(spark, n_docs, partitions=2).write.parquet(corpus_dir)
    src = spark.read.parquet(corpus_dir)

    stream = spark.readStream.schema(src.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(corpus_dir)
    spec = IndexSpec(num_shards=2, salt_buckets=2)
    ix_dir = str(tmp_path / "ix")
    q = incremental_index_refresh(stream, spec, ix_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    ix = Index.load(ix_dir)
    assert ix.n_docs == n_docs
    lineage = ix.lineage(spark).collect()
    assert all(r["status"] == "committed" for r in lineage)

    oracle_ix = build_index(
        spark, src, spec, str(tmp_path / "oracle_ix")
    )
    for query in ("import", "parse buffer", "httpClient retry"):
        assert _full_results(spark, ix, query) == _full_results(
            spark, oracle_ix, query
        ), query

    # optimize analogue folds the segment rows back to one per key
    from cascading_solr_spark.indexing.compact import compact_index

    compacted = compact_index(spark, ix)
    dup = (
        compacted.postings(spark)
        .groupBy("shard", "term", "salt")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert _full_results(spark, compacted, "import") == _full_results(
        spark, oracle_ix, "import"
    )


def test_batch_append_documents(spark, tmp_path):
    """The batch append API: build on slice A, append slice B, results match
    a single build of A ∪ B exactly (scores are id-assignment-independent)."""
    from cascading_solr_spark.indexing.append import append_documents

    corpus_dir = str(tmp_path / "corpus")
    synth_corpus(spark, 80, partitions=2).write.parquet(corpus_dir)
    full = spark.read.parquet(corpus_dir)
    part_a = full.filter(F.crc32(F.col("path")) % 2 == 0)
    part_b = full.filter(F.crc32(F.col("path")) % 2 == 1)

    spec = IndexSpec(num_shards=2, salt_buckets=2)
    ix_dir = str(tmp_path / "ix")
    build_index(spark, part_a, spec, ix_dir)
    ix = append_documents(spark, ix_dir, part_b)
    assert ix.n_docs == 80

    oracle_ix = build_index(spark, full, spec, str(tmp_path / "oracle_ix"))
    assert abs(ix.avgdl - oracle_ix.avgdl) < 1e-9
    for query in ("import", "parse buffer", "readJson batch"):
        assert _full_results(spark, ix, query) == _full_results(
            spark, oracle_ix, query
        ), query
    # dict df merged exactly
    got = {r["term"]: r["df"] for r in ix.term_dict(spark).collect()}
    want = {r["term"]: r["df"] for r in oracle_ix.term_dict(spark).collect()}
    assert got == want


def test_stateful_streaming_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: the closed-session stream
    equals the batch window-function sessionize (same gap, same per-user
    session ordinals).  Event-time timeouts (watermark past end+gap) close
    the trailing open sessions; a far-future flush user advances the
    watermark across micro-batches (maxFilesPerTrigger=1)."""
    import datetime as dt

    from cascading_solr_spark.operators.sessions import sessionize
    from cascading_solr_spark.streaming.stateful import streaming_sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(user, eid, offset_s):
        return (int(eid), t0 + dt.timedelta(seconds=offset_s), int(user))

    main = []
    eid = 0
    for user in (1, 2, 3):
        for off in (0, 60, 120):          # session 1
            main.append(ev(user, (eid := eid + 1), off + user))
        for off in (7200, 7260):          # gap > 1800 -> session 2
            main.append(ev(user, (eid := eid + 1), off + user))
    schema = "event_id long, ts timestamp, user_id long"
    events_dir = str(tmp_path / "sess_events")
    os.makedirs(events_dir)
    spark.createDataFrame(main, schema).coalesce(1).write.parquet(
        events_dir + "/f1"
    )
    # flush batches: far-future events advance the watermark so the main
    # users' trailing sessions time out (their own sessions are excluded)
    for i, days in enumerate((10, 20), start=2):
        spark.createDataFrame(
            [ev(999, 9000 + i, days * 86400)], schema
        ).coalesce(1).write.parquet(events_dir + f"/f{i}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir + "/f*")
    )
    q = (
        streaming_sessionize(stream, gap_seconds=1800, watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sess_out WHERE user_id != 999"
        ).collect()
    )
    expected = sorted(
        tuple(r)
        for r in sessionize(
            spark.createDataFrame(main, schema), gap_seconds=1800
        )
        .select("user_id", "session_id", "n_events", "start_s", "end_s")
        .collect()
    )
    assert got == expected and len(got) == 6
