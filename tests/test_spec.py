"""Plan-time validation failures — mirrors the reference's TapException tests
(/root/reference/src/test/java/.../core/AbstractSolrSchemeTest.java:59-92)."""

import pytest
from pyspark.sql import types as T

from cascading_solr_spark.spec import IndexSpec, IndexSpecError, validate_schema

CORPUS = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def test_valid_spec_passes():
    validate_schema(CORPUS, IndexSpec())


def test_missing_spec_field():
    # analogue: "Sink field name doesn't exist in Solr schema"
    spec = IndexSpec(content_field="body")
    with pytest.raises(IndexSpecError, match="body"):
        validate_schema(CORPUS, spec)


def test_missing_required_key_field():
    # analogue: "No sink field name for required Solr field"
    schema = T.StructType([f for f in CORPUS.fields if f.name != "commit"])
    with pytest.raises(IndexSpecError, match="commit"):
        validate_schema(schema, IndexSpec())


def test_wrong_content_type():
    schema = T.StructType(
        [f for f in CORPUS.fields if f.name != "content"]
        + [T.StructField("content", T.IntegerType())]
    )
    with pytest.raises(IndexSpecError, match="must be string"):
        validate_schema(schema, IndexSpec())


def test_bad_spec_params():
    with pytest.raises(IndexSpecError):
        IndexSpec(num_shards=0)
    with pytest.raises(IndexSpecError):
        IndexSpec(block_size=0)
    with pytest.raises(IndexSpecError):
        IndexSpec(key_fields=(), doc_id_field=None)


def test_wrong_doc_id_type():
    schema = T.StructType(
        CORPUS.fields + [T.StructField("doc_id", T.StringType())]
    )
    with pytest.raises(IndexSpecError, match="doc_id"):
        validate_schema(schema, IndexSpec(doc_id_field="doc_id"))
