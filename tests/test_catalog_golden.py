"""Golden replay of the reference's committed stage-1 outputs.

The reference ships its own outputs (data_pair/L_out.csv, S_out.csv).
Because the `data` column holds complete scene names, stage 1 is
re-runnable from the CSVs alone: feed the non-placeholder `data` values
back in as the directory listing and the engine must reproduce every
(class, path, data) row in order (SURVEY.md §5).
"""

from __future__ import annotations

import csv
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from sentinel_landsat_database_creation_spark.functions.dates import (
    GOLDEN_GRID,
    hls_date,
    s2_date,
)
from sentinel_landsat_database_creation_spark.operators.catalog import build_catalog

GOLDEN_DIR = Path("/root/reference/data_pair")


def _load_golden(name: str) -> list[dict[str, str]]:
    with open(GOLDEN_DIR / name, newline="") as f:
        return list(csv.DictReader(f))


@pytest.mark.parametrize(
    "golden_csv,date_fn,root",
    [
        ("L_out.csv", hls_date, "./2023/crop/L8_bis_crop"),
        ("S_out.csv", s2_date, "./2023/crop/S2_bis_crop"),
    ],
)
def test_catalog_reproduces_golden(spark, golden_csv, date_fn, root):
    golden = _load_golden(golden_csv)
    listing = [r["data"] for r in golden if r["data"] != "0"]
    df = spark.createDataFrame([(d,) for d in listing], ["data"])

    out = build_catalog(df, date_fn(F.col("data")), root, GOLDEN_GRID)
    rows = [(r["class"], r["path"], r["data"]) for r in out.collect()]
    expect = [(r["class"], r["path"], r["data"]) for r in golden]
    assert rows == expect


def test_golden_grid_shape():
    assert GOLDEN_GRID.n_bins == 53
    assert str(GOLDEN_GRID.first_edge) == "2022-12-29"
    assert str(GOLDEN_GRID.last_edge) == "2024-01-04"
