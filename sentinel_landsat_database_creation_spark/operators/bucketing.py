"""Bucketed tables: co-located joins without a shuffle (SURVEY.md §6
scale notes; no reference counterpart — the reference joins in pandas).

At 100 TB the dominant cost of a repeated equi-join is re-shuffling the
fact table every query. Writing it ONCE bucketed by the join key makes
every subsequent join/groupBy on that key exchange-free: Spark reads
bucket i of both sides into the same task. This module wraps the
saveAsTable plumbing and asserts the property the whole point rests on —
``assert_no_shuffle_join`` fails loudly if a plan regression
reintroduces an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.
    Sorting within buckets additionally removes the Sort from
    sort-merge joins, leaving a pure zip of pre-sorted bucket files.

    n_buckets is a real tuning knob: it fixes join parallelism for every
    future reader, so size it to target-cluster cores and per-task
    memory (buckets ~ 2-4x total cores; each bucket must fit a task).

    ``path`` makes it an external bucketed table at that location
    (bucket metadata still lives in the catalog — Spark's bucketed scan
    needs the table entry either way); without it the files land in the
    session's warehouse dir, which may not be writable for an embedding
    caller."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans SortMergeJoin over the existing bucket
    layout — zero Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Guard: raise if the plan contains any shuffle Exchange. Used by
    tests (and available to pipelines) to pin the bucketing contract."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan.replace("BroadcastExchange", ""):
        raise AssertionError(
            "expected an exchange-free bucketed join, got:\n" + plan
        )
