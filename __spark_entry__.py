"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship weekly-class catalog query at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the operator registry
(sentinel_landsat_database_creation_spark.plans.driver_queries) that the
driver hash-compares against DuckDB at sf=0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sentinel_landsat_database_creation_spark.plans.driver_queries import (  # noqa: E402
    REGISTRY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sentinel_landsat_database_creation_spark.plans.driver_queries import (
        q_catalog_week_class,
    )

    return q_catalog_week_class(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops omitted."""
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
