"""Index compaction — the explicit ``optimize(maxSegments)`` analogue
(reference: core/SolrWriter.java:112, hadoop/SolrOutputFormat.java:35,
local/SolrScheme.java:27: hard commit then merge segments at close).

After resume waves or streaming appends a shard dir can hold many files and
a (shard, term, salt) key can be split across posting rows.  Compaction
rebuilds the postings FROM THE COMPRESSED ROWS (decode -> merge -> re-encode
via the same assembler), never re-tokenizing the corpus: one term-sorted
file per shard, one row per (shard, term, salt), fresh dict + lineage.
The swap is directory-atomic (write to .compact.tmp, rename).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascading_solr_spark.codec import decode_doc_ids, decode_varint
from cascading_solr_spark.indexing.build import (
    POSTINGS_SCHEMA,
    TF_SCHEMA,
    Index,
    _assembler,
)


def _decode_kernel(batches):
    """posting rows -> (doc_id, dl, shard, term, tf) long rows (vectorized:
    one concat per batch, no per-posting Python)."""
    for pdf in batches:
        ids_l, tfs_l, dls_l, terms_l, shards_l = [], [], [], [], []
        for row in pdf.itertuples(index=False):
            n = int(row.n_docs)
            ids_l.append(decode_doc_ids(row.doc_ids, n))
            tfs_l.append(decode_varint(row.tfs, n))
            dls_l.append(decode_varint(row.dls, n))
            terms_l.append(np.repeat(row.term, n))
            shards_l.append(np.full(n, row.shard, dtype=np.int32))
        if not ids_l:
            continue
        yield pd.DataFrame(
            {
                "doc_id": np.concatenate(ids_l).astype(np.int64),
                "dl": np.concatenate(dls_l).astype(np.int32),
                "shard": np.concatenate(shards_l),
                "term": np.concatenate(terms_l),
                "tf": np.concatenate(tfs_l).astype(np.int32),
            }
        )


def compact_index(spark: SparkSession, index: Index) -> Index:
    """Merge-rewrite the postings of ``index`` in place; returns the index."""
    spec = index.spec
    postings_path = os.path.join(index.path, "postings")
    tmp_path = os.path.join(index.path, "postings.compact.tmp")
    shutil.rmtree(tmp_path, ignore_errors=True)

    tf_long = index.postings(spark).mapInPandas(_decode_kernel, TF_SCHEMA)
    # exact hot set, free from the dict table built at index time
    d = index.term_dict(spark)
    threshold = max(2.0, spec.hot_term_df_ratio * index.n_docs)
    hot = (
        d.filter(F.col("df") > threshold).select(
            "term", F.lit(True).alias("_hot")
        )
        if d is not None
        else spark.createDataFrame([], "term string, _hot boolean")
    )
    salted = (
        tf_long.join(F.broadcast(hot), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(
                    F.floor(F.col("doc_id") / spec.num_shards),
                    F.lit(spec.salt_buckets),
                ).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or "32")
    arranged = salted.repartition(
        max(spec.num_shards, shuffle_parts), "shard", "term", "salt"
    ).sortWithinPartitions("shard", "term", "salt", "doc_id")
    compacted = arranged.mapInPandas(_assembler(index.avgdl, spec), POSTINGS_SCHEMA)
    (
        compacted.repartition(spec.num_shards, "shard")
        .sortWithinPartitions("shard", "term", "salt")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tmp_path)
    )
    bak = postings_path + ".bak"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(postings_path, bak)
    os.rename(tmp_path, postings_path)
    shutil.rmtree(bak)
    return index
