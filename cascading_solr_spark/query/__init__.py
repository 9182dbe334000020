from cascading_solr_spark.query.naive import bm25_topk_df
from cascading_solr_spark.query.search import (
    facet_counts,
    keyword_filter,
    parse_query,
    search,
    search_many,
)

__all__ = [
    "search", "search_many", "keyword_filter", "parse_query", "facet_counts",
    "bm25_topk_df",
]
