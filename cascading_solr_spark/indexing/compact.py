"""Index compaction — the explicit ``optimize(maxSegments)`` analogue
(reference: core/SolrWriter.java:112, hadoop/SolrOutputFormat.java:35,
local/SolrScheme.java:27: hard commit then merge segments at close;
maxSegments is 10 on hadoop / 1 on local).

After resume waves or streaming appends a shard dir can hold many files and
a (shard, term, salt) key can be split across posting rows.  Compaction
rebuilds the postings FROM THE COMPRESSED ROWS (decode -> merge -> re-encode
via the same assembler), never re-tokenizing the corpus: ``max_segments``
files per shard (default 1), one row per (shard, term, salt), and a rebuilt
lineage table (per-shard terms/postings/bytes go stale once split rows
merge).  The dict table is unchanged — global df per term is
segment-layout-independent.

The dict table's accumulated append segments (indexing/append.py) are folded
back to one row per term in the same pass.

Crash safety: the new postings generation is written to a fresh
``postings.genN`` directory, then meta.json is atomically replaced
(os.replace) to point at it.  A crash at any step leaves a complete,
queryable postings directory.  Deletion of superseded generations is
DEFERRED one compaction: the generation being replaced is kept on disk so
Index handles loaded before the flip (a cached handle, a concurrent reader)
keep working — read-while-compact; generations older than that are
garbage-collected here.  Writers are single-threaded by contract (one
builder/appender/compactor at a time), readers are unrestricted."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyspark.storagelevel import StorageLevel

from cascading_solr_spark.codec import (
    DELETED_TERM,
    decode_doc_ids,
    decode_varint,
    split_varint_payload,
)
from cascading_solr_spark.indexing.build import (
    DL_BITS,
    KW_SEP,
    Index,
    _assembler,
    _shard_salt_exprs,
    pack_id_dl,
    postings_schema,
    tf_schema,
    write_meta,
)


def _decode_kernel(block_size: int, positions: bool = False):
    """posting rows -> (packed(doc_id, dl), term, tf) long rows (vectorized:
    one concat per batch, no per-posting Python).

    With ``positions`` each long row also carries its per-posting position
    blob — SLICED from the group payload without a value decode (varint
    boundaries are self-describing and each posting's delta chain is
    self-contained), so compaction round-trips positions byte-identically.
    Keyword-term rows (StrField — positionless, empty payload) re-emit
    empty blobs."""

    def decode(batches):
        for pdf in batches:
            ids_l, tfs_l, dls_l, terms_l = [], [], [], []
            pos_l: list[list[bytes]] = []
            for row in pdf.itertuples(index=False):
                n = int(row.n_docs)
                ids_l.append(decode_doc_ids(row.doc_ids, n, block_size))
                tfs = decode_varint(row.tfs, n)
                tfs_l.append(tfs)
                dls_l.append(decode_varint(row.dls, n))
                terms_l.append(np.repeat(row.term, n))
                if positions:
                    buf = row.pos
                    if buf is None or len(buf) == 0:
                        pos_l.append([b""] * n)
                    else:
                        pos_l.append(split_varint_payload(buf, tfs))
            if not ids_l:
                continue
            out = {
                "packed": pack_id_dl(
                    np.concatenate(ids_l).astype(np.int64),
                    np.concatenate(dls_l).astype(np.int64),
                ),
                "term": np.concatenate(terms_l),
                "tf": np.concatenate(tfs_l).astype(np.int32),
            }
            if positions:
                out["pos"] = [b for blobs in pos_l for b in blobs]
            yield pd.DataFrame(out)

    return decode


def compact_index(
    spark: SparkSession, index: Index, max_segments: int = 1
) -> Index:
    """Merge-rewrite the postings of ``index`` into a new generation dir;
    returns a refreshed handle."""
    spec = index.spec
    if not os.path.exists(index.postings_path):
        # 0-doc index (no postings dir yet): nothing to merge
        return index
    old_dirname = index.postings_dirname
    old_path = index.postings_path
    gen = 0
    if old_dirname.startswith("postings.gen"):
        gen = int(old_dirname.rsplit("gen", 1)[1])
    new_dirname = f"postings.gen{gen + 1}"
    new_path = os.path.join(index.path, new_dirname)
    shutil.rmtree(new_path, ignore_errors=True)

    tf_long = index.postings(spark).mapInPandas(
        _decode_kernel(spec.block_size, spec.positions), tf_schema(spec)
    )
    has_deletes = index.has_deletes
    del_ids = None
    if has_deletes:
        # fold deletes (the Lucene segment-merge effect): tombstoned docs
        # leave the postings, the docs table, the dictionary df, and the
        # N/avgdl statistics; n_deleted resets to 0.  The tombstone set is
        # bounded by what accumulated since the last compact (delete batches
        # are micro-batches, same contract as append), so it broadcasts.
        del_ids = index.deleted_ids(spark).persist(StorageLevel.MEMORY_AND_DISK)
        del_ids.count()
        tf_long = (
            tf_long.filter(F.col("term") != DELETED_TERM)
            .withColumn("_did", F.shiftright(F.col("packed"), DL_BITS))
            .join(
                F.broadcast(del_ids.withColumnRenamed("doc_id", "_did")),
                "_did",
                "left_anti",
            )
            .drop("_did")
        )
    # the hot set persisted at build time keeps salting identical across
    # generations (meta.json is the source of truth)
    hot = list(index.hot_terms)
    shard_e, salt_e = _shard_salt_exprs(hot, spec)
    salt_keys = [salt_e] if salt_e is not None else []
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or "32")
    arranged = tf_long.repartition(
        max(spec.num_shards, shuffle_parts), shard_e, F.col("term"), *salt_keys
    ).sortWithinPartitions(
        shard_e, F.xxhash64("term"), *salt_keys, F.col("packed")
    )
    compacted = arranged.mapInPandas(_assembler(spec, hot), postings_schema(spec))
    if max_segments <= 1:
        placed = compacted.repartition(spec.num_shards, "shard")
    else:
        # term-hash bucket caps files-per-shard at ~max_segments (an upper
        # bound, like Lucene's maxSegments) while keeping files term-sorted
        placed = compacted.withColumn(
            "_seg", F.pmod(F.xxhash64("term"), F.lit(max_segments))
        ).repartition(spec.num_shards * max_segments, "shard", "_seg")
    final = placed.sortWithinPartitions("shard", "term", "salt").drop("_seg")
    obs = None
    if has_deletes:
        # post-fold corpus stats ride the postings write as an Observation
        # (the same no-extra-job trick the append path uses)
        from pyspark.sql import Observation

        obs = Observation("compact_fold_stats")
        final = final.observe(
            obs,
            F.sum(
                F.when(~F.col("term").contains(KW_SEP), F.col("sum_tf"))
            ).alias("content_tokens"),
            *[
                F.sum(
                    F.when(
                        F.col("term").startswith(f + KW_SEP), F.col("sum_tf")
                    )
                ).alias(f"ftok_{i}")
                for i, f in enumerate(spec.text_fields)
            ],
        )
    final.write.mode("overwrite").partitionBy("shard").parquet(new_path)

    # fold dict append segments -> one (term, df) row per term, published as
    # a NEW meta-pointed generation dir (exactly like postings): the old dict
    # dir is never renamed away, so a crash at ANY step leaves a complete
    # dict on disk — the rename-swap this replaces had a window where no dict
    # dir existed and the next append would silently recreate it with only
    # its own batch's (term, df) rows (wrong global df, no error).
    old_dict_dirname = index.dict_dirname
    have_dict = os.path.exists(index.dict_path)
    new_dict_dirname = old_dict_dirname
    if have_dict:
        dgen = 0
        if old_dict_dirname.startswith("dict.gen"):
            dgen = int(old_dict_dirname.rsplit("gen", 1)[1])
        new_dict_dirname = f"dict.gen{dgen + 1}"
        new_dict_path = os.path.join(index.path, new_dict_dirname)
        shutil.rmtree(new_dict_path, ignore_errors=True)
        if has_deletes:
            # df shrinks where deleted docs left the postings: re-derive the
            # dictionary from the new generation's row metadata (term,
            # n_docs) — compressed-row stats only, no payload decode
            folded = (
                spark.read.parquet(new_path)
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df"))
            )
        else:
            folded = (
                spark.read.parquet(index.dict_path)
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
            )
        (
            folded.repartition(max(1, spec.num_shards // 4), "term")
            .sortWithinPartitions("term")
            .write.parquet(new_dict_path)
        )

    # spellcheck ngram index: append segments accumulate duplicate
    # (gram, term) pairs (harmless for countDistinct lookups, but they grow)
    # — regenerate from the freshly-folded vocabulary as a new generation.
    # The folded dict IS the complete vocabulary at compact time, so a
    # PRE-ngram index (built before the feature) safely bootstraps its ngram
    # table here — gated on have_dict alone, not on a pre-existing ngram dir
    # (append.py can only bootstrap at n_docs=0; compact has the full vocab).
    old_ngrams_dirname = index.ngrams_dirname
    have_ngrams = have_dict
    new_ngrams_dirname = old_ngrams_dirname
    if have_ngrams:
        from cascading_solr_spark.indexing.build import term_ngram_rows

        ngen = 0
        if old_ngrams_dirname.startswith("dict_ngrams.gen"):
            ngen = int(old_ngrams_dirname.rsplit("gen", 1)[1])
        new_ngrams_dirname = f"dict_ngrams.gen{ngen + 1}"
        new_ngrams_path = os.path.join(index.path, new_ngrams_dirname)
        shutil.rmtree(new_ngrams_path, ignore_errors=True)
        (
            term_ngram_rows(spark.read.parquet(new_dict_path).select("term"))
            .repartition(max(1, spec.num_shards // 4), "gram")
            .sortWithinPartitions("gram")
            .write.parquet(new_ngrams_path)
        )

    # rebuilt lineage: per-shard stats change once split rows merge (rows are
    # per-shard truth again — tagged "compacted")
    lineage_path = os.path.join(index.path, "lineage")
    built = spark.read.parquet(new_path)
    lineage = built.groupBy("shard").agg(
        F.count("*").alias("terms"),
        F.sum("n_docs").alias("postings"),
        F.sum("n_bytes").alias("bytes"),
        (F.max("n_docs") / F.avg("n_docs")).alias("skew_ratio"),
        F.lit("committed").alias("status"),
        F.lit("compacted").alias("segment"),
    )
    lineage_tmp = lineage_path + ".tmp"
    shutil.rmtree(lineage_tmp, ignore_errors=True)
    lineage.write.parquet(lineage_tmp)

    # fold deletes out of the stored docs: a NEW meta-pointed generation
    # (docs.genN), same crash-safety rule as postings/dict
    old_docs_dirname = index.docs_dirname
    new_docs_dirname = old_docs_dirname
    n_live = None
    if has_deletes and os.path.exists(index.docs_path):
        docgen = 0
        if old_docs_dirname.startswith("docs.gen"):
            docgen = int(old_docs_dirname.rsplit("gen", 1)[1])
        new_docs_dirname = f"docs.gen{docgen + 1}"
        new_docs_path = os.path.join(index.path, new_docs_dirname)
        shutil.rmtree(new_docs_path, ignore_errors=True)
        (
            index.docs(spark)
            .join(F.broadcast(del_ids), "doc_id", "left_anti")
            .repartition(spec.num_shards, "shard")
            .sortWithinPartitions("shard", "doc_id")
            .write.partitionBy("shard")
            .parquet(new_docs_path)
        )
        n_live = spark.read.parquet(new_docs_path).count()  # footer-served

    # atomic publish: ONE meta replace flips every generation pointer
    with open(os.path.join(index.path, "meta.json")) as fh:
        meta = json.load(fh)
    meta["postings_dirname"] = new_dirname
    meta["dict_dirname"] = new_dict_dirname
    meta["ngrams_dirname"] = new_ngrams_dirname
    if has_deletes:
        meta["docs_dirname"] = new_docs_dirname
        content_tokens = int(obs.get["content_tokens"] or 0)
        if n_live is not None:
            meta["n_docs"] = int(n_live)
        meta["total_tokens"] = content_tokens
        meta["avgdl"] = (
            content_tokens / meta["n_docs"] if meta["n_docs"] else 0.0
        )
        meta["field_tokens"] = {
            f: int(obs.get[f"ftok_{i}"] or 0)
            for i, f in enumerate(spec.text_fields)
        }
        # ids are never reused: next_doc_id stays monotonic across the fold
        meta["n_deleted"] = 0
    write_meta(index.path, meta)
    shutil.rmtree(lineage_path, ignore_errors=True)
    os.rename(lineage_tmp, lineage_path)
    # deferred GC: keep the generation we just replaced (read-while-compact
    # for handles loaded before the flip); delete anything older.
    keep = {
        "postings": (new_dirname, old_dirname),
        "dict": (new_dict_dirname, old_dict_dirname),
        "dict_ngrams": (new_ngrams_dirname, old_ngrams_dirname),
        "docs": (new_docs_dirname, old_docs_dirname),
    }
    if del_ids is not None:
        del_ids.unpersist()
    for name in os.listdir(index.path):
        base = name.split(".gen")[0]
        if base in keep and name not in keep[base]:
            shutil.rmtree(os.path.join(index.path, name), ignore_errors=True)
    return Index.load(index.path)
