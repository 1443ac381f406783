"""Gap-based sessionization — the custom stateful streaming operator
(SURVEY.md §2.10 extension; nothing in the reference is stateful, so
this is a north-star addition for event pipelines at scale).

Two implementations with identical semantics:

- ``sessionize_batch``: lag/cumsum window chain, fully SQL-expressible
  (exact DuckDB oracle in the driver registry). Shuffles once on
  user_id; both window functions and the final groupBy reuse that
  partitioning, so Catalyst plans a single Exchange.
- ``sessionize_stateful``: ``applyInPandasWithState`` over an unbounded
  stream grouped by user_id. State per user = the open session
  (start, last_ts, n, value_sum); a row further than ``gap`` from
  last_ts closes the open session (emitted) and opens a new one. Closed
  sessions are emitted as they close; the open session stays in state
  across micro-batches. Equality with the batch plan is pinned by
  tests/test_extensions.py using per-user far-future sentinel rows that
  force every real session closed.

A session row: (user_id, session_start, session_end, n_events,
total_value). Ties on ts are broken by event_id so both engines and
both implementations agree deterministically.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from .._serde import register_self

register_self(__name__)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

# applyInPandasWithState state tuple: (session_start_us, last_ts_us, n, sum)
_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT, s DOUBLE"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: one shuffle on user_id, then lag -> gap
    flag -> running session ordinal -> per-session aggregate, all within
    the same hash partitioning (no second Exchange)."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60 * 1_000_000)  # microseconds, like stateful
    brk = (
        F.when(F.lag("ts").over(order).isNull(), F.lit(1))
        .when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(order)) > gap,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("brk", brk)
        .withColumn("sess", F.sum("brk").over(run))
        .groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("user_id").cast("long"),
            "session_start",
            "session_end",
            F.col("n_events").cast("long"),
            "total_value",
        )
    )


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    """Per-user state transition: fold this batch's rows (sorted by
    ts, event_id) into the open session, emitting sessions closed by
    the gap. Vectorized — segment boundaries, counts and sums are
    numpy ops (bincount accumulates in row order, so within-batch float
    sums match the sequential fold bit-for-bit; a carried-over state sum
    is added after its segment's batch rows, which is exact whenever
    values are integer-valued — the registry pre-scales to cents);
    Python cost is O(segments), not O(rows)."""
    import numpy as np

    chunks = list(pdfs)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    vals = rows["value"].to_numpy(dtype="float64")

    if state.exists:
        start, last, n, s = state.get
    else:
        start, last, n, s = (int(ts_us[0]), int(ts_us[0]), 0, 0.0)

    # Does the batch's first row close the carried-over open session?
    head_closed = n > 0 and int(ts_us[0]) - last > gap_us
    if head_closed:
        head = (start, last, n, s)
        n, s = 0, 0.0
    # Segment the batch rows at intra-batch gaps; row 0 never breaks
    # (it either continues the open session — checked above — or
    # starts a fresh one).
    brk = np.empty(len(ts_us), dtype=bool)
    brk[0] = False
    np.greater(np.diff(ts_us), gap_us, out=brk[1:])
    seg = np.cumsum(brk)
    nseg = int(seg[-1]) + 1
    counts = np.bincount(seg, minlength=nseg)
    sums = np.bincount(seg, weights=vals, minlength=nseg)
    first_idx = np.concatenate(([0], np.flatnonzero(brk)))
    starts = ts_us[first_idx]
    ends = ts_us[np.concatenate((first_idx[1:] - 1, [len(ts_us) - 1]))]
    # Merge the still-open carried session into segment 0.
    if n > 0:
        starts[0] = start
        counts[0] += n
        sums[0] += s
    state.update(
        (int(starts[-1]), int(ts_us[-1]), int(counts[-1]), float(sums[-1]))
    )

    # Emit closed sessions (all segments but the last, plus the
    # head-of-batch closure) straight from numpy — no python lists.
    o_start, o_end = starts[: nseg - 1], ends[: nseg - 1]
    o_n, o_s = counts[: nseg - 1], sums[: nseg - 1]
    if head_closed:
        o_start = np.concatenate(([head[0]], o_start))
        o_end = np.concatenate(([head[1]], o_end))
        o_n = np.concatenate(([head[2]], o_n))
        o_s = np.concatenate(([head[3]], o_s))
    if len(o_start) == 0:
        yield pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64"),
                "total_value": pd.Series(dtype="float64"),
            }
        )
        return
    yield pd.DataFrame(
        {
            "user_id": np.full(len(o_start), int(key[0]), dtype="int64"),
            "session_start": o_start.astype("datetime64[us]"),
            "session_end": o_end.astype("datetime64[us]"),
            "n_events": o_n.astype("int64"),
            "total_value": o_s.astype("float64"),
        }
    )


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Streaming sessionization over an unbounded event stream: group by
    user_id, carry the open session in GroupState, emit sessions as the
    gap closes them. Scale note: state is O(1) per user (four scalars),
    and the shuffle key is user_id — skew-safe for web-scale user
    distributions because each group's per-batch work is bounded by its
    batch rows, not history."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_native(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "0 seconds"
) -> DataFrame:
    """Third implementation: Spark's built-in ``session_window`` — the
    whole operator stays JVM-side (no Python workers, no custom state
    schema), which is the preferred production shape when the built-in
    gap semantics suffice. Requires a watermark in append mode; emitted
    sessions are those the watermark has sealed (session_end + gap <=
    final watermark), so each user's trailing session stays in state —
    the same visible-output contract as sessionize_stateful, gated by
    event-time watermark instead of per-user arrival order.

    tests pin its output against sessionize_batch filtered to
    watermark-sealed sessions."""
    gap = f"{gap_minutes} minutes"
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            F.col("user_id").cast("long"),
            "session_start",
            "session_end",
            F.col("n_events").cast("long"),
            "total_value",
        )
    )
