"""Streaming operators over the events fixture schema.

Design notes for scale:
- watermarks bound state: without them, windowed aggs and dedup state
  grow without limit on a 100 TB/day stream;
- ``foreach_batch_merge`` reuses the batch merge_upsert operator per
  micro-batch — the Structured Streaming idiom for upsert sinks (the
  reference's COPY+ON CONFLICT loop, made incremental);
- availableNow trigger turns any streaming pipeline into an
  incremental batch run — the reference's Airflow re-run pattern
  (dags/etl_pipeline.py:42-49) without the file-existence checks.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators.joins import merge_upsert
from firmable_aus_etl_spark.schemas import TESTDATA_SCHEMAS


def _stream_schema(table: str):
    """Streaming schema: engine-written event dirs carry microsecond
    TimestampType ts (datasets.load_table already normalized the raw
    testdata's nanosecond longs), so the stream reads ts as timestamp."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    base = TESTDATA_SCHEMAS[table]
    if table != "events":
        return base
    return StructType(
        [
            StructField("ts", TimestampType(), True) if f.name == "ts" else f
            for f in base.fields
        ]
    )


def read_stream_parquet(
    spark: SparkSession, path: str, table: str = "events"
) -> DataFrame:
    """File-source stream with the declared schema (streams require an
    explicit schema — inference would race the writer)."""
    return spark.readStream.schema(_stream_schema(table)).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window counts with late-data bound.

    Output: (window_start, window_end, event_type, cnt, total_value).
    """
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    *,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon.

    The streaming twin of op17 keyed dedup: state holds one entry per
    key until the watermark passes — bounded memory at any scale.
    """
    return events.withWatermark("ts", watermark).dropDuplicates(list(keys))


def streaming_dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    *,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermark-expiring keyed dedup via the native
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+).

    Differs from streaming_dedup in state semantics when the key does
    NOT include the event-time column: plain dropDuplicates keeps one
    state row per key FOREVER unless ts is part of the key, while this
    variant drops a key's state once the watermark passes its last
    sighting — the right tool for at-least-once sources whose
    duplicates arrive close together (Kafka redeliveries), where
    unbounded key state is the 100 TB failure mode.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def foreach_batch_merge(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    *,
    checkpoint: str,
    tracked: Sequence[str] | None = None,
):
    """writeStream.foreachBatch sink that merge-upserts each micro-batch
    into a parquet target (op24 made incremental).

    Parquet has no transactional MERGE, so each batch rewrites the
    target (read -> merge_upsert -> overwrite); on Delta/Iceberg the
    same callable becomes a real MERGE INTO. Returns the started query.
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(target_path)
        except Exception:
            existing = None
        if existing is None:
            merged = batch
        else:
            merged = merge_upsert(existing, batch, list(keys), tracked=tracked)
        # materialize before overwriting the input path
        merged.cache()
        merged.count()
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def lakehouse_stream_sink(
    stream: DataFrame,
    root: str,
    keys: Sequence[str],
    *,
    checkpoint: str,
    partition_col: str | None = None,
    tracked: Sequence[str] | None = None,
):
    """writeStream.foreachBatch sink that MERGEs each micro-batch into
    a snapshot-isolated lakehouse table — foreach_batch_merge upgraded
    from overwrite-a-parquet-dir to real snapshot semantics: every
    micro-batch commits a new atomic snapshot (readers never see a
    torn batch, time travel across batches comes free), and with
    ``partition_col`` each batch rewrites only the partitions it
    touches while the rest carry forward as hard links.

    This IS the reference's incremental-load story (SURVEY §2.10: its
    'streaming' surface is offset-paginated extraction + UPSERT loads)
    composed end to end: Structured Streaming supplies delivery and
    checkpointing, the lakehouse supplies transactional MERGE. Replays
    of a batch are idempotent by merge semantics (update-iff-changed),
    so at-least-once delivery yields an exactly-once table. Returns
    the started query.
    """
    from firmable_aus_etl_spark.sources import lakehouse as LH

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if partition_col is not None:
            LH.merge_into_partitioned_snapshot(
                spark, root, batch, list(keys), partition_col, tracked=tracked
            )
        else:
            LH.merge_into_snapshot(
                spark, root, batch, list(keys), tracked=tracked
            )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def verified_near_dup_stream_sink(
    candidates: DataFrame,
    docs_source,
    root: str,
    *,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
):
    """Streaming VERIFIED near-dups (round-6 verdict #5): the stateful
    MinHash-LSH candidate stream (streaming/stateful.py) runs the
    exact-Jaccard verify leg inside the foreachBatch merge, so the
    lakehouse table holds verified pairs — batch-equal to
    operators/dedup.verified_near_dup_pairs over the same documents.

    Per micro-batch: the (small) candidate pair set broadcast-joins
    the documents' hashed distinct-shingle arrays — the IDENTICAL
    verify expressions as the batch operator (array_intersect size,
    |A∪B| = |A|+|B|-|A∩B| on xxhash64 longs), so jaccard values are
    bit-equal — then pairs >= threshold MERGE into the snapshot table
    keyed (a_id, b_id). Cross-band duplicate emissions and replays
    collapse by merge semantics (exactly-once table from an
    at-least-once stream); a candidate that fails verification is
    simply never written.

    ``docs_source``: a static DataFrame over the document corpus, or a
    zero-arg callable returning one (re-evaluated per batch so
    file-backed corpora grow with the stream). Both documents of an
    emitted candidate have necessarily ARRIVED (the pair emits when
    the second one does), so a source view that includes everything
    the stream has delivered is sufficient; pairs whose documents the
    view can't resolve yet are retried implicitly on replay only —
    use the same source the stream reads to make the view complete.

    Scale shape: verification cost is O(batch candidates * doc_len),
    the docs side is column-pruned to (id, shingle hashes), and only
    verified pairs reach the merge. Returns the started query.
    """
    from firmable_aus_etl_spark.operators.dedup import shingle_frame
    from firmable_aus_etl_spark.sources import lakehouse as LH

    def _verify_merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        docs = docs_source() if callable(docs_source) else docs_source
        h = shingle_frame(docs, id_col, text_col, shingle_n=shingle_n).select(
            "__id",
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s)).alias("__h"),
        )
        pairs = F.broadcast(batch.dropDuplicates(["a_id", "b_id"]))
        a = h.select(F.col("__id").alias("a_id"), F.col("__h").alias("__h_a"))
        b = h.select(F.col("__id").alias("b_id"), F.col("__h").alias("__h_b"))
        inter = F.size(
            F.array_intersect(F.col("__h_a"), F.col("__h_b"))
        ).cast("double")
        union = (
            F.size(F.col("__h_a")) + F.size(F.col("__h_b"))
        ).cast("double") - inter
        verified = (
            pairs.join(a, "a_id")
            .join(b, "b_id")
            .withColumn(
                "jaccard",
                F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", "jaccard")
        )
        LH.merge_into_snapshot(spark, root, verified, ["a_id", "b_id"])

    return (
        candidates.writeStream.foreachBatch(_verify_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    by: Sequence[tuple[str, str]] = (),
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join within an event-time interval: right
    rows with ``left_ts <= right_ts <= left_ts + within`` per key pair.

    The streaming twin of operators/joins.point_in_interval_join. Both
    sides carry watermarks and the join condition bounds the time gap
    in BOTH directions — that pair of constraints is what lets Spark
    evict buffered state (unbounded stream-stream joins hold both
    streams forever; at 100 TB/day that is an OOM, not a design).
    Inner-join matches emit immediately; state for rows older than
    watermark + within is dropped.

    ``by`` is a list of (left_col, right_col) equality pairs; column
    names must be disjoint across the two inputs (rename before
    joining, same contract as the batch range join).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
    )
    for lc, rc in by:
        cond = cond & (F.col(f"l.{lc}") == F.col(f"r.{rc}"))
    return l.join(r, on=cond, how="inner")
