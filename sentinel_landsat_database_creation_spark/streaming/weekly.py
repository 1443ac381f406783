"""Streaming weekly tumbling-window counts (SURVEY.md §2.10).

The reference's weekly histogram (op 21) exposed over Structured
Streaming: readStream -> window(ts, '7 days') aggregate -> sink. Spark's
``window`` aligns tumbling windows to the 1970-01-01 epoch, so the
streaming bins are bit-identical to the batch operator and the DuckDB
oracle (SURVEY.md §1.4).

``weekly_counts_once`` drains a parquet-backed stream with the
availableNow trigger into an in-memory sink and returns the result as a
batch DataFrame — this is how the driver's batch-shaped correctness gate
exercises a genuinely streaming plan. On a real deployment the same
plan runs unbounded with ``weekly_counts_stream`` + a watermark for late
data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def weekly_counts_stream(events: DataFrame, watermark: str = "14 days") -> DataFrame:
    """The unbounded plan: watermarked epoch-aligned weekly counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "7 days").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("week_start"),
            F.col("n_events").cast("long"),
        )
    )


def weekly_counts_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events table through the streaming plan once
    (availableNow) and return the aggregated result."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from ..sources.testdata import normalize_event_ts

    stream = normalize_event_ts(stream)
    out = weekly_counts_stream(stream)
    name = f"weekly_counts_{uuid.uuid4().hex[:8]}"
    # streaming state-store count is fixed at query start from
    # spark.sql.shuffle.partitions; 8 stores beat 32 on checkpoint
    # overhead for drain-sized state (measured on the sessions ops)
    from .drain import drain_checkpoint_dir, no_data_batch

    ckpt = drain_checkpoint_dir(name)
    # complete-mode output re-emits the full aggregate every data
    # batch — the trailing no-data batch adds a whole extra round of
    # state commits for rows already in the sink (measured 3.35 ->
    # 0.90 s at sf0.1, identical rows; rationale + per-trigger
    # restore-after-termination discipline on no_data_batch itself).
    with no_data_batch(spark, False):
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                out.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        # bounded drain: a stuck availableNow run becomes a recorded
        # error, not a hang that kills the caller's batch of queries
        try:
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError(
                    "weekly_counts_once drain did not finish within 300s"
                )
        finally:
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).orderBy("week_start")
