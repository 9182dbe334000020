from cascading_solr_spark.query.boolean import boolean_match_ids, search_boolean
from cascading_solr_spark.query.functions import func_sql, parse_function
from cascading_solr_spark.query.naive import bm25_topk_df
from cascading_solr_spark.query.search import (
    facet_counts,
    keyword_filter,
    join_match_ids,
    more_like_this,
    parse_query,
    search,
    search_boosted,
    search_joined,
    search_many,
    sort_by_function,
    suggest_terms,
)

__all__ = [
    "search", "search_many", "keyword_filter", "parse_query", "facet_counts",
    "suggest_terms", "more_like_this", "bm25_topk_df",
    "search_boolean", "boolean_match_ids",
    "search_boosted", "sort_by_function", "parse_function", "func_sql",
    "search_joined", "join_match_ids",
]
