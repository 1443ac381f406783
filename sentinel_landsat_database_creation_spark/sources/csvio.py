"""CSV catalog source with the reference's header validation (op 3;
fct_data_extraction.py:220-227 checks the ``['class','path','data']``
header before pairing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CATALOG_SCHEMA

CATALOG_HEADER = ["class", "path", "data"]


def read_catalog_csv(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .schema(CATALOG_SCHEMA)
        .csv(path)
    )
    # Validate the actual header line, mirroring the reference's check —
    # schema-on-read would silently mis-map a reordered file.
    header = spark.read.text(path).first()
    if header is None or header[0].split(",") != CATALOG_HEADER:
        raise ValueError(
            f"catalog csv {path} must have header {CATALOG_HEADER!r}, "
            f"got {header[0] if header else 'empty file'!r}"
        )
    return df


def read_pair_csv(spark: SparkSession, path: str) -> DataFrame:
    """Stage-3 input: pair CSV with stringified data_2, parsed back into
    a real array column (op 39 shim)."""
    from pyspark.sql import functions as F

    from ..compat.golden import parse_stringified_list

    raw = spark.read.option("header", True).csv(path)
    if set(raw.columns) != {"data_1", "data_2"}:
        raise ValueError(
            f"pair csv {path} must have header ['data_1','data_2'], got {raw.columns}"
        )
    return raw.select(
        "data_1", parse_stringified_list(F.col("data_2")).alias("data_2")
    )
