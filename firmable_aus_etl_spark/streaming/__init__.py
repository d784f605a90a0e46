"""Structured Streaming surface (SURVEY.md §2.10).

The reference has no streaming; its incremental semantics are
offset-paginated batch extraction + UPSERT loads. This module is the
engine's forward extension: the same operators (windowed aggregation,
keyed dedup, merge) expressed over unbounded input with watermarks.
"""

from firmable_aus_etl_spark.streaming.ops import (
    read_stream_parquet,
    windowed_event_counts,
    streaming_dedup,
    foreach_batch_merge,
    stream_stream_interval_join,
)
from firmable_aus_etl_spark.streaming.incremental import (  # noqa: F401
    incremental_agg_stream,
    incremental_distinct_stream,
    ingest_embeddings_increment,
    ingest_embeddings_stream,
    ingest_increment,
    ingest_stream,
    read_agg_view,
    read_distinct_view,
    read_vector_corpus,
)
from firmable_aus_etl_spark.streaming.sketches import (  # noqa: F401
    read_quantile_estimate,
    streaming_heavy_hitters,
    streaming_quantile_histogram,
)
from firmable_aus_etl_spark.streaming.stateful import (
    sessionize_stream,
    sessionize_stream_eventtime,
)

__all__ = [
    "read_stream_parquet",
    "windowed_event_counts",
    "streaming_dedup",
    "foreach_batch_merge",
    "stream_stream_interval_join",
    "sessionize_stream",
    "sessionize_stream_eventtime",
]
