from cascading_solr_spark.query.naive import bm25_topk_df
from cascading_solr_spark.query.search import search

__all__ = ["search", "bm25_topk_df"]
