"""Incremental document append — the segment-style index refresh.

Lucene analogy: each appended batch is a new segment.  Unlike round 1's
per-epoch standalone indexes, appends here produce ONE coherent index:

* new doc_ids are assigned ABOVE the current max (``meta.next_doc_id``), so
  ids never collide across batches and posting rows stay mergeable
  (strictly-increasing doc ids per (term, salt));
* batch postings are built with the same SPIMI + salted-shuffle pipeline and
  appended into the live shard dirs — the query kernels already merge
  multiple rows per (term, salt), so new docs are searchable immediately;
* global statistics refresh atomically: the dict table is merged (old df +
  batch df) into a new generation dir and meta.json (N, total_tokens ->
  avgdl, next_doc_id) is replaced via os.replace.  Block pruning metadata
  stores raw (max_tf, min_dl), so a shifting avgdl never invalidates it;
* the salt decisions reuse the hot set persisted at build time
  (meta.hot_terms) — deterministic layout, no extra stats job;
* BM25 scores after an append are EXACTLY the scores a from-scratch build of
  the union corpus would produce (scoring depends only on global N, avgdl,
  df, tf, dl — none of which depend on id assignment order), asserted in
  tests/test_streaming.py;
* ``compact_index`` is the optimize() analogue that folds accumulated
  segment rows back into one row per key.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cascading_solr_spark.indexing.build import (
    KW_SEP,
    POSTINGS_SCHEMA,
    TF_SCHEMA,
    Index,
    _assembler,
    _keyword_tf_rows,
    _rank_ids,
    _shard_salt_exprs,
    _spimi_tf_kernel,
    _write_lineage,
    _write_postings,
    validate_schema,
    write_meta,
)


def append_documents(
    spark: SparkSession, index_dir: str, batch: DataFrame
) -> Index:
    """Append a batch of new documents to an existing index (one segment)."""
    index = Index.load(index_dir)
    spec = index.spec
    validate_schema(batch.schema, spec)
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    offset = int(meta.get("next_doc_id", meta["n_docs"]))

    # ---- doc ids above the current max (caller-provided ids are trusted:
    # the caller owns uniqueness, exactly like Solr's uniqueKey) ----
    if spec.doc_id_field:
        based = batch.withColumn("doc_id", F.col(spec.doc_id_field).cast("long"))
        n_new = batch.count()
        ids_handle = None
    else:
        ids_handle, n_new = _rank_ids(batch, spec.key_fields)
        based = batch.join(
            ids_handle.hint("shuffle_hash"), list(spec.key_fields)
        ).withColumn("doc_id", F.col("doc_id") + F.lit(offset))
    if not n_new:
        if ids_handle is not None:
            ids_handle.unpersist()
        return index

    tf_long: DataFrame | None = None
    try:
        # ---- docs rows append (same layout/sort as the build) ----
        docs = based.select(
            "doc_id",
            *[c for c in spec.stored_fields],
            F.sha2(F.col(spec.content_field), 256).alias("sha256"),
            F.pmod(F.col("doc_id"), F.lit(spec.num_shards)).cast("int").alias(
                "shard"
            ),
        )
        (
            docs.repartition(spec.num_shards, "shard")
            .sortWithinPartitions("shard", "doc_id")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(os.path.join(index_dir, "docs"))
        )

        # ---- batch postings (SPIMI + keyword rows + stored hot set) ----
        tf_long = based.select("doc_id", spec.content_field).mapInPandas(
            _spimi_tf_kernel(spec.content_field), TF_SCHEMA
        )
        kw_rows = _keyword_tf_rows(based, spec)
        if kw_rows is not None:
            tf_long = tf_long.unionByName(kw_rows)
        tf_long = tf_long.persist()
        hot = list(index.hot_terms)
        shard_e, salt_e = _shard_salt_exprs(hot, spec)
        salt_keys = [salt_e] if salt_e is not None else []
        arranged = tf_long.repartition(
            max(
                spec.num_shards,
                int(spark.conf.get("spark.sql.shuffle.partitions", "32") or "32"),
            ),
            shard_e, F.col("term"), *salt_keys,
        ).sortWithinPartitions(
            shard_e, F.xxhash64("term"), *salt_keys, F.col("packed")
        )
        postings = arranged.mapInPandas(_assembler(spec, hot), POSTINGS_SCHEMA)
        _write_postings(postings, index.postings_path, spec, mode="append")
        _write_lineage(
            spark,
            index.postings_path,
            os.path.join(index_dir, "lineage"),
            list(range(spec.num_shards)),
        )

        # ---- merged dict generation + stats refresh ----
        batch_stats = tf_long.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ttf")
        ).persist()
        old_dict = index.term_dict(spark)
        merged = batch_stats.select("term", "df")
        if old_dict is not None:
            merged = merged.unionByName(old_dict.select("term", "df"))
        merged = merged.groupBy("term").agg(F.sum("df").alias("df"))
        dict_tmp = os.path.join(index_dir, "dict.tmp")
        shutil.rmtree(dict_tmp, ignore_errors=True)
        (
            merged.repartition(max(1, spec.num_shards // 4), "term")
            .sortWithinPartitions("term")
            .write.parquet(dict_tmp)
        )
        batch_tokens = int(
            batch_stats.filter(~F.col("term").contains(KW_SEP))
            .agg(F.sum("ttf"))
            .collect()[0][0]
            or 0
        )
        batch_stats.unpersist()

        meta["n_docs"] = int(meta["n_docs"]) + int(n_new)
        meta["total_tokens"] = int(meta.get("total_tokens", 0)) + batch_tokens
        meta["avgdl"] = (
            meta["total_tokens"] / meta["n_docs"] if meta["n_docs"] else 0.0
        )
        if not spec.doc_id_field:
            meta["next_doc_id"] = offset + int(n_new)
        # publish: dict swap, then the atomic meta replace
        dict_path = os.path.join(index_dir, "dict")
        dict_old = os.path.join(index_dir, "dict.old")
        shutil.rmtree(dict_old, ignore_errors=True)
        if os.path.exists(dict_path):
            os.rename(dict_path, dict_old)
        os.rename(dict_tmp, dict_path)
        shutil.rmtree(dict_old, ignore_errors=True)
        write_meta(index_dir, meta)
    finally:
        if tf_long is not None:
            tf_long.unpersist()
        if ids_handle is not None:
            ids_handle.unpersist()
    return Index.load(index_dir)
