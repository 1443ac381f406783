"""Time range join (SURVEY.md §2 op 18, the richer variant): pair rows
whose timestamps fall within a tolerance of each other, as a SCALABLE
equi-join.

A naive ``|l.ts - r.ts| <= tol`` join condition has no equi-key, so
Spark plans BroadcastNestedLoopJoin — quadratic and single-task (see
similarity.blocked_self_pairs for why that dies). The standard fix is
temporal bucketing: bucket both sides by ``tol``-sized epochs, fan the
right side out to its bucket ±1, equi-join on (key, bucket), then apply
the exact tolerance as a cheap residual filter. Every qualifying pair
matches on exactly one bucket (the left row's own), so no dedup is
needed, and the join is an ordinary shuffled hash join whose fan-out is
bounded by per-bucket density — the 100 TB-safe shape Spark's own
range-join strategies use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    tol_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Inner join of left x right on ``key_col`` with
    ``|left.ts - right.ts| <= tol_seconds``.

    Output columns: every left column prefixed ``l_``, every right
    column prefixed ``r_``, plus ``dt_us`` (right minus left, signed
    microseconds).
    """
    tol_us = tol_seconds * 1_000_000
    l_us = F.unix_micros(F.col(ts_col))
    l = left.select(
        F.col(key_col).alias("_key"),
        F.floor(l_us / tol_us).alias("_bucket"),
        l_us.alias("_l_us"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
    )
    r = right.select(
        F.col(key_col).alias("_key"),
        F.explode(
            F.array(
                F.floor(l_us / tol_us) - 1,
                F.floor(l_us / tol_us),
                F.floor(l_us / tol_us) + 1,
            )
        ).alias("_bucket"),
        l_us.alias("_r_us"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    return (
        l.join(r, ["_key", "_bucket"])
        .filter(F.abs(F.col("_r_us") - F.col("_l_us")) <= tol_us)
        .withColumn("dt_us", F.col("_r_us") - F.col("_l_us"))
        .drop("_key", "_bucket", "_l_us", "_r_us")
    )
