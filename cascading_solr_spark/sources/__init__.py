from cascading_solr_spark.sources.loaders import (
    read_documents_csv,
    read_documents_extract,
    read_documents_json,
    read_documents_xml,
)
from cascading_solr_spark.sources.tables import load_table, read_corpus

__all__ = [
    "load_table",
    "read_corpus",
    "read_documents_csv",
    "read_documents_extract",
    "read_documents_json",
    "read_documents_xml",
]
