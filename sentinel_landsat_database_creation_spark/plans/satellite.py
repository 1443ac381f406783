"""End-to-end satellite pipeline: the reference's four stages as one
lazy Spark plan graph (SURVEY.md §3 E1-E4), Parquet as the inter-stage
format.

    stage 1  build_catalog          per sensor          (E1)
    stage 2  pair_catalogs          week-class join     (E2)
    stage 3  decode + stack_bands   scene tensors       (E3)
    stage 4  crop engine            aligned crop pairs  (E4)

At 100 TB each stage boundary is an ordinary shuffle (or a Parquet
handoff if checkpointing is desired); nothing is collected to the
driver. Scene tensors partition by scene; crops are rows, partitioned by
pair — both embarrassingly parallel. Only the per-pair greedy dedup
(compat mode) serializes within a single scene pair, which is bounded by
one pair's candidate-center list (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import GOLDEN_GRID, WeekGrid, hls_date, s2_date
from ..operators.catalog import build_catalog
from ..operators.crops import (
    candidate_centers,
    quality_flag,
    slice_crop_pairs,
    suppress_overlap_greedy,
    suppress_overlap_grid,
)
from ..operators.pairing import pair_catalogs
from ..operators.stacking import stack_bands


@dataclass(frozen=True)
class CropConfig:
    """Stage-4 knobs; defaults shrink the reference's 300/3/0.7 run
    (main_code.py:50) to fixture scale."""

    batch_size: int = 12
    scale: int = 3
    pct_overlap: float = 0.7
    overlap: bool = True
    compat: bool = True  # as-built quirks vs clean native semantics
    shuffle_seed: int | None = None


def build_scene_pairs(
    s2_listing: DataFrame,
    hls_listing: DataFrame,
    s2_root: str = "S2",
    hls_root: str = "L8",
    grid: WeekGrid = GOLDEN_GRID,
) -> DataFrame:
    """Stages 1-2: catalogs for both sensors, paired by week class.
    Returns exploded (pair_id, s2_scene, hls_scene) rows — the
    ArrayType pair table flattened for downstream joining."""
    s2_cat = build_catalog(
        s2_listing, s2_date(F.col("data")), s2_root, grid, keep_week=True
    )
    hls_cat = build_catalog(
        hls_listing, hls_date(F.col("data")), hls_root, grid, keep_week=True
    )
    pairs = pair_catalogs(s2_cat, hls_cat)
    exploded = pairs.select(
        F.col("data_1").alias("s2_path"),
        F.explode("data_2").alias("hls_path"),
    )
    return exploded.select(
        F.xxhash64("s2_path", "hls_path").alias("pair_id"),
        F.element_at(F.split("s2_path", "/"), -1).alias("s2_scene"),
        F.element_at(F.split("hls_path", "/"), -1).alias("hls_scene"),
    )


def build_pair_tensors(
    scene_pairs: DataFrame,
    s2_rasters: DataFrame,
    hls_rasters: DataFrame,
) -> DataFrame:
    """Stage 3: stack decoded band rasters per scene and attach both
    tensors to each pair row. Tensors join by scene key — each scene
    decodes once however many pairs reference it."""
    s2_t = stack_bands(s2_rasters)
    hls_t = stack_bands(hls_rasters)
    return (
        scene_pairs.join(
            s2_t.select(
                F.col("scene").alias("s2_scene"),
                F.col("bands").alias("hr_bands"),
                F.col("width").alias("hr_width"),
                F.col("height").alias("hr_height"),
            ),
            "s2_scene",
        )
        .join(
            hls_t.select(
                F.col("scene").alias("hls_scene"),
                F.col("bands").alias("lr_bands"),
                F.col("width").alias("lr_width"),
                F.col("height").alias("lr_height"),
            ),
            "hls_scene",
        )
    )


def write_scene_tensors(
    tensors: DataFrame, path: str, date_expr: F.Column
) -> None:
    """Stage-3 sink: scene tensors land as Parquet partitioned by the
    epoch-aligned acquisition week (the reference's `2023/...` directory
    layout, SURVEY.md §4, made first-class). Any week- or date-ranged
    read then prunes partitions at planning time — at 100 TB a one-month
    training window touches ~4/52ths of the data and the scan plan
    shows it (PartitionFilters in explain)."""
    from ..functions.dates import epoch_week_start

    (
        tensors.withColumn("week", epoch_week_start(date_expr))
        .write.mode("overwrite")
        .partitionBy("week")
        .parquet(path)
    )


def read_scene_tensors(
    spark, path: str, start: str | None = None, stop: str | None = None
) -> DataFrame:
    """Week-pruned scan of a write_scene_tensors dataset; [start, stop)
    bounds are dates compared against the week partition column, so the
    filter resolves to partition pruning, not data reading."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("week") >= F.lit(start))
    if stop is not None:
        df = df.filter(F.col("week") < F.lit(stop))
    return df


def build_crop_dataset(
    pair_tensors: DataFrame,
    mask: DataFrame,
    cfg: CropConfig = CropConfig(),
) -> DataFrame:
    """Stage 4: candidate centers x pair tensors -> quality-filtered,
    overlap-suppressed crop pairs. Returns one row per accepted crop
    with both pixel payloads (CROP_PAIR_SCHEMA shape).

    Payload discipline (round 4, measured on the ~117k-crop volume
    fixture): suppression decisions flow through METADATA-sized rows
    only. Phase 1 slices every candidate and computes the quality flag,
    but projects the pixel arrays away in the same stage — crops are
    born and die inside one codegen'd task, so the suppression
    shuffle/sort (grid) or Arrow transfer (greedy walk) moves ~24-byte
    rows, not ~5 KB payloads. Phase 2 re-slices ONLY the survivors
    (keyed per pair) to emit payload rows. The earlier one-pass shape
    that carried payloads through the suppression exchange OOMed a 1 GB
    heap at 1e5 crops; this one runs it with headroom, and at 100 TB it
    means the wide ops on this path never see a pixel.

    Negative result, measured (r5): a "stats-only" phase 1 that skips
    materializing the crop arrays and instead counts each quality stat
    directly over per-row window slices is ~1.5x SLOWER (5.96 s vs
    3.93 s at the 103k-crop volume) — four independent count passes
    re-slice every window row per stat, while the current shape slices
    once into a flat array and runs four codegen'd filters over it.
    Materialize-once-then-filter wins even when the materialized value
    dies in the same task."""
    centers = candidate_centers(mask, cfg.batch_size, compat_bounds=cfg.compat)
    sliced = slice_crop_pairs(pair_tensors, centers, cfg.batch_size, cfg.scale)
    meta = sliced.withColumn(
        "ok", quality_flag(cfg.batch_size, cfg.scale, compat=cfg.compat)
    ).select("pair_id", "mask_id", "ord", "r", "c", "ok")
    if cfg.compat:
        kept = suppress_overlap_greedy(
            meta,
            cfg.batch_size,
            cfg.pct_overlap,
            overlap=cfg.overlap,
            shuffle_seed=cfg.shuffle_seed,
        )
    else:
        kept = suppress_overlap_grid(
            meta.filter(F.col("ok")), cfg.batch_size, cfg.pct_overlap
        )
    survivors = kept.select(
        "pair_id", F.lit(0).alias("ord"), "r", "c"
    )
    return slice_crop_pairs(
        pair_tensors, survivors, cfg.batch_size, cfg.scale
    ).select(
        "pair_id",
        F.col("r").alias("center_r"),
        F.col("c").alias("center_c"),
        F.col("hr_crop").alias("hr_pixels"),
        F.col("lr_crop").alias("lr_pixels"),
        F.lit(cfg.batch_size).alias("hr_size"),
        F.lit(cfg.batch_size // cfg.scale).alias("lr_size"),
    )
