from cascading_solr_spark.indexing.append import append_documents
from cascading_solr_spark.indexing.build import Index, assign_doc_ids, build_index
from cascading_solr_spark.indexing.delete import delete_by_query, delete_documents
from cascading_solr_spark.indexing.replicate import restore_index, snapshot_index
from cascading_solr_spark.indexing.update import atomic_update

__all__ = [
    "Index",
    "append_documents",
    "atomic_update",
    "assign_doc_ids",
    "build_index",
    "delete_by_query",
    "delete_documents",
    "restore_index",
    "snapshot_index",
]
