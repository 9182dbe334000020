from cascading_solr_spark.indexing.build import Index, assign_doc_ids, build_index

__all__ = ["Index", "assign_doc_ids", "build_index"]
