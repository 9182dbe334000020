from cascading_solr_spark.streaming.refresh import (
    incremental_index_refresh,
    windowed_event_counts,
)

__all__ = ["incremental_index_refresh", "windowed_event_counts"]
