"""Sources: Iceberg-first corpus reader with Parquet fallback.

The target deployment reads the 10^12-file corpus from an Iceberg table
(BASELINE.json input_hint); this sandbox has no Iceberg jars, so the reader
degrades to plain Parquet transparently (same DataFrame shape).  The
reference's sources were Hadoop SequenceFiles / Kryo taps
(SolrSchemeHadoopTest.java:70, SolrSchemeLocalTest.java:40) — sink-only
scheme, so our read path is strictly new surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided test table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the source-code corpus: Iceberg table if the catalog/jars exist,
    else a Parquet directory path."""
    if "/" not in location and "." in location:
        try:  # looks like a catalog table name -> try Iceberg/catalog read
            return spark.read.table(location)
        except Exception:
            pass
    try:
        return spark.read.format("iceberg").load(location)
    except Exception:
        return spark.read.parquet(location)
