"""Cluster entrypoint: build (or resume) the index via spark-submit.

The north-rule launch shape (BASELINE.json: "run via spark-submit
--py-files on multi-executor clusters"):

    cd /root/repo && zip -qr /tmp/css.zip cascading_solr_spark
    spark-submit --master <cluster> --py-files /tmp/css.zip \\
        scripts/submit_build.py \\
        --corpus <iceberg-table-or-parquet-dir> --out <index-dir> \\
        --shards 64 [--resume] [--positions] \\
        [--keyword-fields lang] [--stored-fields repo,path,commit,lang]

No SparkSession is constructed with a hard-coded master: spark-submit's
--master/--conf own the cluster shape, so the same script runs local[N]
and a 1000-executor cluster unchanged.  The build is resumable
(--resume skips shards whose lineage rows are complete) and writes
per-partition lineage + metrics as always.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="Iceberg table name or parquet dir")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--keyword-fields", default="")
    ap.add_argument("--content-field", default="content")
    ap.add_argument(
        "--doc-id-field", default=None,
        help="pre-existing dense doc id column (else ids derive from key fields)",
    )
    ap.add_argument(
        "--key-fields", default="repo,path,commit",
        help="columns whose combination uniquely keys a doc",
    )
    ap.add_argument(
        "--stored-fields", default="repo,path,commit,lang",
        help="comma-separated stored fields",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from cascading_solr_spark.indexing import build_index
    from cascading_solr_spark.sources import read_corpus
    from cascading_solr_spark.spec import IndexSpec

    spark = SparkSession.builder.appName("cascading-solr-spark-build").getOrCreate()
    corpus = read_corpus(spark, args.corpus)
    spec = IndexSpec(
        num_shards=args.shards,
        salt_buckets=args.salt_buckets,
        positions=args.positions,
        content_field=args.content_field,
        doc_id_field=args.doc_id_field,
        key_fields=tuple(f for f in args.key_fields.split(",") if f),
        keyword_fields=tuple(f for f in args.keyword_fields.split(",") if f),
        stored_fields=tuple(f for f in args.stored_fields.split(",") if f),
    )
    ix = build_index(spark, corpus, spec, args.out, resume=args.resume)
    lineage = ix.lineage(spark)
    rows = lineage.groupBy("status").count().collect()
    print({r["status"]: r["count"] for r in rows}, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
