from cascading_solr_spark.sources.tables import load_table, read_corpus

__all__ = ["load_table", "read_corpus"]
