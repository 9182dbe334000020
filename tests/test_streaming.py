"""Structured Streaming extensions: windowed event aggregation (stream ==
batch result) and foreachBatch incremental index refresh (segments build and
answer queries).  The reference is batch-only (SURVEY.md §2.3) — these are
engine extensions, tested for plumbing correctness."""

import os

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import Index
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


@pytest.mark.parametrize("n_docs", [60])
def test_incremental_refresh_builds_segments(spark, tmp_path, n_docs):
    corpus_dir = str(tmp_path / "stream_corpus")
    synth_corpus(spark, n_docs, partitions=2).write.parquet(corpus_dir)
    src = spark.read.parquet(corpus_dir)

    stream = spark.readStream.schema(src.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(corpus_dir)
    spec = IndexSpec(num_shards=2, salt_buckets=2)
    ix_dir = str(tmp_path / "ix")
    q = incremental_index_refresh(
        stream, spec, ix_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    segments = sorted(d for d in os.listdir(ix_dir) if d.startswith("segment="))
    assert segments, "no index segments written"
    total = 0
    for seg in segments:
        ix = Index.load(os.path.join(ix_dir, seg))
        total += ix.n_docs
        res = search(spark, ix, "import", k=5, with_stored=False).collect()
        assert len(res) > 0
        lineage = ix.lineage(spark).collect()
        assert all(r["status"] == "committed" for r in lineage)
    assert total == n_docs
