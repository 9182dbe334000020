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


def read_documents_extract(
    spark: SparkSession,
    path: str,
    extractor=None,
    literals: dict[str, str] | None = None,
    glob: str | None = None,
    spec: IndexSpec | None = None,
) -> DataFrame:
    """The /update/extract handler analogue (solrconfig.xml:997
    ExtractingRequestHandler — solr-cell/Tika): ingest raw files, extract
    text content plus file metadata, and add Solr's ``literal.<field>``
    constant columns.

    The scan is Spark's distributed ``binaryFile`` source (one task per
    file group, columnar metadata, predicate pushdown on path via
    ``glob``); extraction runs as an Arrow-batched ``mapInPandas`` —
    the Spark-side plumbing (schema, batching, literals, spec validation)
    is real and tested.  ``extractor`` is the Tika seam: a callable
    ``(payload: bytes, path: str) -> str``.  The default extractor handles
    text-like payloads (clean UTF-8 decode — Tika's text/plain path) and
    raises ``NotImplementedError`` for true binary formats, because Tika
    itself is not available in this environment (declared stub; plug a
    real parser in production).

    Returns ``(path, length, content, *literals)``.
    """
    import pandas as pd

    def _default_extractor(payload: bytes, fpath: str) -> str:
        try:
            return payload.decode("utf-8")
        except UnicodeDecodeError:
            raise NotImplementedError(
                f"binary format extraction for {fpath!r} needs a Tika-like "
                f"parser; pass extractor= (this environment has none)"
            )

    ext = extractor or _default_extractor
    lits = dict(literals or {})
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select("path", "length", "content")

    lit_schema = "".join(f", {k} string" for k in lits)
    out_schema = f"path string, length long, content string{lit_schema}"

    def extract(batches):
        for pdf in batches:
            texts = [
                ext(bytes(payload), p)
                for payload, p in zip(pdf["content"], pdf["path"])
            ]
            out = pd.DataFrame(
                {"path": pdf["path"], "length": pdf["length"], "content": texts}
            )
            for k, v in lits.items():
                out[k] = v
            yield out

    df = raw.mapInPandas(extract, out_schema)
    if spec is not None:
        validate_schema(df.schema, spec)
    return df


def read_documents_xml(
    spark: SparkSession,
    path: str,
    spec: IndexSpec | None = None,
    glob: str | None = None,
) -> DataFrame:
    """The /update XML handler analogue (solrconfig.xml:968
    UpdateRequestHandler; Solr's native ``<add><doc><field name="f">v
    </field>...</doc></add>`` payload).

    Unlike /update/extract there is no parser stub here — the format is
    XML with a fixed schema, parsed distributedly with the stdlib
    ElementTree inside an Arrow-batched ``mapInPandas`` over a
    ``binaryFile`` scan (one task per file group; a 100 TB ingest is many
    files, not one).  Multi-valued fields (repeated ``<field name="x">``)
    join on a comma — callers needing arrays should split downstream
    (documented; the engine's keyword fields accept scalars).  Field NAMES
    are discovered from the first file on the driver (one tiny read), then
    fixed for the distributed pass — Solr's own contract is that docs in
    one add batch share the schema.

    Returns one column per discovered field name (all strings).
    """
    import glob as globmod
    import os
    import xml.etree.ElementTree as ET

    import pandas as pd

    def docs_of(payload: bytes):
        root = ET.fromstring(payload)
        for doc in root.iter("doc"):
            row: dict[str, str] = {}
            for f in doc.iter("field"):
                name = f.attrib["name"]
                val = f.text or ""
                row[name] = f"{row[name]},{val}" if name in row else val
            yield row

    # schema discovery: the first file, driver-side
    pattern = os.path.join(path, glob or "*")
    first = sorted(globmod.glob(pattern))
    if not first:
        raise FileNotFoundError(f"no files match {pattern}")
    with open(first[0], "rb") as fh:
        head_rows = list(docs_of(fh.read()))
    if not head_rows:
        raise ValueError(f"{first[0]} holds no <doc> elements")
    fields = sorted({k for r in head_rows for k in r})

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select("content")

    out_schema = ", ".join(f"{f} string" for f in fields)

    def parse(batches):
        for pdf in batches:
            rows = [
                {f: r.get(f) for f in fields}
                for payload in pdf["content"]
                for r in docs_of(bytes(payload))
            ]
            yield pd.DataFrame(rows, columns=fields)

    df = raw.mapInPandas(parse, out_schema)
    if spec is not None:
        validate_schema(df.schema, spec)
    return df
