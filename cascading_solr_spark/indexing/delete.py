"""Document deletion — delete tombstones riding the postings format.

The reference's embedded Solr serves the standard /update delete commands
(deleteById / deleteByQuery); its bulk-load path explicitly opts OUT of the
sibling overwrite behavior (``overwrite=false``, core/SolrWriter.java:37-39
— SOLR-653), which is our append fast path (S8).  This module is the other
side of that same update contract, with Lucene's exact visibility model:

* a delete takes effect IMMEDIATELY for matching (deleted docs stop
  appearing in results, counts, facets — the liveDocs bitmap analogue);
* corpus statistics (df, N, avgdl) stay UNCHANGED until segments merge, so
  surviving docs keep bit-identical scores across a delete — Lucene scores
  with deletions present behave the same way;
* compaction (`indexing.compact.compact_index`) folds tombstones away:
  deleted docs' postings and stored rows are dropped, the dictionary df and
  the N/avgdl stats are recomputed, and ``n_deleted`` resets to 0.

Representation: tombstones are ordinary posting rows under the reserved
``codec.DELETED_TERM`` (never a legal analyzed or keyword term), written
through the SAME salt/shard/assembler pipeline as real postings.  That buys:
one extra term in each query's pruned IN-list scan (only when deletes
exist — a zero-delete index plans byte-identically), in-shard exclusion
inside every kernel with no extra job or broadcast, replication snapshots
that carry deletes for free, and an O(delete-batch) write cost independent
of index size.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cascading_solr_spark.codec import DELETED_TERM
from cascading_solr_spark.indexing.build import (
    DL_BITS,
    _balanced_shard_key,
    MAX_DOC_ID,
    Index,
    _assembler,
    _shard_salt_exprs,
    postings_schema,
    write_meta,
)
from cascading_solr_spark.spec import IndexSpecError


def delete_documents(
    spark: SparkSession,
    index_dir: str,
    ids: DataFrame | Iterable[int],
) -> Index:
    """Tombstone the given doc_ids (Solr deleteById).  Returns a refreshed
    handle whose query paths exclude the docs immediately.

    ``ids`` is a doc_id DataFrame (single long column) or an iterable of
    ints.  Deleting an id that does not exist (or is already deleted) is a
    no-op for matching, exactly like Solr; ``meta.n_deleted`` counts
    tombstones written, not live-doc removals — it only drives the
    has-deletes fast path and compaction's fold, never scoring.  Single
    writer at a time, same contract as append."""
    index = Index.load(index_dir)
    spec = index.spec
    if isinstance(ids, DataFrame):
        (col,) = ids.columns[:1] or ("doc_id",)
        ids_df = ids.select(F.col(col).cast("long").alias("doc_id")).distinct()
        # cut lineage: deleteByQuery's ids READ the postings dir this write
        # APPENDS to — materialize executor-side before planning the write
        ids_df = ids_df.localCheckpoint(eager=True)
    else:
        vals = sorted({int(i) for i in ids})
        ids_df = spark.createDataFrame([(v,) for v in vals], "doc_id long")
    bounds = ids_df.agg(
        F.count("*").alias("n"), F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    n_del = int(bounds["n"])
    if not n_del:
        return index
    if bounds["lo"] < 0 or bounds["hi"] > MAX_DOC_ID:
        raise IndexSpecError(
            f"doc ids must be in [0, {MAX_DOC_ID}] "
            f"(got min={bounds['lo']}, max={bounds['hi']})"
        )

    pos_cols = (
        [F.lit(b"").cast("binary").alias("pos")] if spec.positions else []
    )
    tf_long = ids_df.select(
        (F.shiftleft(F.col("doc_id"), DL_BITS) + F.lit(1)).alias("packed"),
        F.lit(DELETED_TERM).alias("term"),
        F.lit(1).cast("int").alias("tf"),
        *pos_cols,
    )
    hot = list(index.hot_terms)
    shard_e, salt_e = _shard_salt_exprs(hot, spec)
    salt_keys = [salt_e] if salt_e is not None else []
    arranged = tf_long.repartition(
        spec.num_shards, _balanced_shard_key(shard_e, spec.num_shards)
    ).sortWithinPartitions(
        shard_e, F.xxhash64("term"), *salt_keys, F.col("packed")
    )
    postings = arranged.mapInPandas(_assembler(spec, hot), postings_schema(spec))
    # single-exchange write (the append path's shape, r6b): the tombstone
    # rows are already partitioned by the shard expression, so the segment
    # merge's second exchange would only re-move this tiny batch — a local
    # term sort satisfies the writer's required ordering and the partitionBy
    # still lands each shard's rows in its own dir, one file per batch.
    (
        postings.sortWithinPartitions("shard", "term", "salt")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(index.postings_path)
    )

    # no dict segment (DELETED_TERM must never surface in spellcheck /
    # terms / luke), no doc rows, no token stats: stats stay stale by design
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    meta["n_deleted"] = int(meta.get("n_deleted", 0)) + n_del
    write_meta(index_dir, meta)
    return Index.load(index_dir)


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    filters: dict[str, str] | None = None,
    op: str = "OR",
    synonyms: dict[str, list[str]] | None = None,
) -> Index:
    """Solr deleteByQuery: tombstone the query's full match set (the
    match-only kernel — ``match_ids`` — is exactly what Solr's DBQ path
    consumes; same analyzed/keyword/op semantics as search)."""
    from cascading_solr_spark.query.search import match_ids

    index = Index.load(index_dir)
    ids = match_ids(
        spark, index, query, filters=filters, op=op, synonyms=synonyms
    )
    return delete_documents(spark, index_dir, ids)
