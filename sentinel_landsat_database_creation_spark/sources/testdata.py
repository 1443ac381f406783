"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Parquet scans stay lazy; Catalyst prunes columns and pushes filters into
the scan, so loading "all tables" costs nothing until an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive for driver-owned sessions built without our factory:
    # timestamp semantics (date truncation, week binning, literal
    # comparisons) must be UTC for every table, and events' nanos-typed
    # parquet must scan. Both confs are runtime-mutable.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read nanos as long and
        # truncate to micros (matching DuckDB's ns->us view of the same
        # file).
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TESTDATA_TABLES}
