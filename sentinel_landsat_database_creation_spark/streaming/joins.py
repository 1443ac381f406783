"""Stream-stream interval join (click -> signup attribution).

Extension beyond the reference pipeline (SURVEY.md §6): the reference's
temporal pairing (op 18, `data_pair/main_function.py` week matching) is
batch-only; the streaming twin of that capability is Spark's
watermarked stream-stream join — each side buffers state, the interval
condition bounds how long a row can possibly match, and the watermark
lets the engine evict state older than the bound. This is the standard
online-attribution shape: "which signups happened within H hours of a
click by the same user".

Determinism for the correctness gate: the drain uses one parquet file
and a watermark far wider than the fixture's event-time span, so no
state is evicted mid-drain and the inner join emits exactly the batch
join's row multiset regardless of micro-batch splits. In production you
set ``watermark`` to just past ``horizon_hours`` plus your lateness
budget — state then stays O(events within the horizon), which is what
makes this run unbounded at 100 TB/day (the interval condition gives
the state-cleanup proof; without it Spark must keep both sides
forever).
"""

from __future__ import annotations

import shutil
import uuid

from .drain import drain_checkpoint_dir, no_data_batch

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def click_signup_join_stream(
    clicks: DataFrame,
    signups: DataFrame,
    horizon_hours: int = 6,
    watermark: str = "90 days",
) -> DataFrame:
    """The unbounded plan: per-user signups within ``horizon_hours`` of
    a click. Both sides carry watermarks and the join condition bounds
    signup time on both ends, so the state store is provably prunable.
    Output is append-only (inner join): one row per (click, signup)
    match with the exact microsecond lag.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    s = signups.withWatermark("ts", watermark).select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
    )
    joined = c.join(
        s,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("signup_ts") >= F.col("click_ts"))
        & (
            F.col("signup_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_hours} HOURS")
        ),
        "inner",
    )
    return joined.select(
        F.col("click_id").cast("long"),
        F.col("signup_id").cast("long"),
        F.col("user_id").cast("long"),
        F.date_format("click_ts", _TS_FMT).alias("click_ts"),
        F.date_format("signup_ts", _TS_FMT).alias("signup_ts"),
        (F.unix_micros(F.col("signup_ts")) - F.unix_micros(F.col("click_ts")))
        .cast("long")
        .alias("lag_us"),
    )


def click_signup_join_once(
    spark: SparkSession, sf_dir: str, horizon_hours: int = 6
) -> DataFrame:
    """Drain the events table through the stream-stream join once
    (availableNow) and return the matched pairs as a batch DataFrame.

    The two sides are independent readStream sources over the same
    parquet (filtered to click / signup), the layout a real deployment
    would have with separate topics.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def side(event_type: str) -> DataFrame:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        from ..sources.testdata import normalize_event_ts

        stream = normalize_event_ts(stream)
        return stream.filter(F.col("event_type") == event_type)

    out = click_signup_join_stream(
        side("click"), side("signup"), horizon_hours=horizon_hours
    )
    name = f"click_signup_{uuid.uuid4().hex[:8]}"
    ckpt = drain_checkpoint_dir(name)
    # inner stream-stream joins emit matches in the data batch itself;
    # the trailing no-data batch only advances the watermark for state
    # EVICTION, which a one-shot drain never reuses (measured 3.27 ->
    # 1.73 s at sf0.1, identical rows — rationale + per-trigger
    # restore-after-termination discipline on no_data_batch itself).
    with no_data_batch(spark, False):
        # state-store count fixed at query start; 8 stores beat 32 on
        # checkpoint overhead for drain-sized state (measured, weekly.py)
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                out.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        # bounded drain: a stuck run is a recorded error, not a hang
        try:
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError(
                    "click_signup_join_once drain did not finish within 300s"
                )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).orderBy("click_id", "signup_id")
