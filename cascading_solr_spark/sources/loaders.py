"""Document loaders: the /update/json and /update/csv handler analogues.

The reference's embedded Solr accepts documents through format-specific
update handlers (solrconfig.xml:981 JsonUpdateRequestHandler, :986
CSVRequestHandler, :968 XML UpdateRequestHandler); the Cascading side feeds
them tuples from SequenceFiles (SolrScheme sink).  Here the equivalents are
thin *declarative* readers — ``spark.read.json`` / ``spark.read.csv`` with
the spec's schema expectations validated eagerly (fail before any job, the
SolrSchemeUtil.java:87-101 rule) — whose output feeds ``build_index`` /
``append_documents`` unchanged.  Using Spark's own readers keeps the scan
distributed, columnar where possible, and schema-inferred exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cascading_solr_spark.spec import IndexSpec, validate_schema


def read_documents_json(
    spark: SparkSession,
    path: str,
    spec: IndexSpec | None = None,
    multiline: bool = False,
    schema: str | None = None,
) -> DataFrame:
    """Read documents from JSON — JSON Lines by default; ``multiline=True``
    accepts the Solr update-handler shape (one top-level array of doc
    objects, the /update/json payload).  ``schema`` (DDL string) skips
    inference — at 100 TB schema inference is a full extra pass, so
    production callers should always pass it.  With ``spec``, the frame is
    validated eagerly against the index spec before any indexing job."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("multiLine", "true" if multiline else "false").json(
        path
    )
    if spec is not None:
        validate_schema(df.schema, spec)
    return df


def read_documents_csv(
    spark: SparkSession,
    path: str,
    spec: IndexSpec | None = None,
    header: bool = True,
    sep: str = ",",
    schema: str | None = None,
) -> DataFrame:
    """Read documents from CSV (the /update/csv handler analogue).  Same
    contract as :func:`read_documents_json`: pass ``schema`` to skip the
    inference pass; ``spec`` validates eagerly."""
    reader = spark.read.option("header", "true" if header else "false").option(
        "sep", sep
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if spec is not None:
        validate_schema(df.schema, spec)
    return df
