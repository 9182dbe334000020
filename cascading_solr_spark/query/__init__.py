from cascading_solr_spark.query.naive import bm25_topk_df
from cascading_solr_spark.query.search import (
    keyword_filter,
    parse_query,
    search,
    search_many,
)

__all__ = [
    "search", "search_many", "keyword_filter", "parse_query", "bm25_topk_df",
]
