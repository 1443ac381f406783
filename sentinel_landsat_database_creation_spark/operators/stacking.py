"""Stage 3 — band filtering and scene tensor stacking (reference E3,
SURVEY.md §2 ops 10/11/38/42).

The reference stacks 4 spectral bands per scene into a [1,4,H,W] tensor
(main_function_beta.py:126-158,166-200). Band->channel order is fixed:
Landsat [B02,B03,B04,B05], Sentinel-2 [B2,B3,B4,B8] (blue/green/red/NIR,
main_function_beta.py:99,136,178). Here stacking is a groupBy +
sort_array(collect_list(struct(band_rank, pixels))): deterministic
channel order (the beta variant's fix, op 11) with the original
variant's xml-exclusion guard retained (op 10 dropped it — documented
divergence in favor of correctness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LANDSAT_BANDS = ("B02", "B03", "B04", "B05")
SENTINEL_BANDS = ("B2", "B3", "B4", "B8")


def band_rank(band: Column, bands: tuple[str, ...]) -> Column:
    """1-based channel position of a band token; 0 = not a kept band."""
    return F.array_position(
        F.array(*[F.lit(b) for b in bands]), band
    ).cast("int")


def filter_band_files(
    files: DataFrame,
    bands: tuple[str, ...],
    filename_col: str = "filename",
    exclude_xml: bool = True,
) -> DataFrame:
    """Ops 10/11: keep exactly the spectral band files, tagged with their
    deterministic channel rank. Band token is matched as a delimited
    path component (``.B02.``-style), mirroring the reference's
    substring test but robust to band tokens embedding each other
    (B2 vs B02 for S2 vs Landsat naming)."""
    name = F.col(filename_col)
    out = files.withColumn(
        "band",
        F.coalesce(
            *[
                F.when(name.rlike(f"[._]{b}[._]"), F.lit(b))
                for b in bands
            ]
        ),
    ).filter(F.col("band").isNotNull())
    if exclude_xml:
        out = out.filter(~name.contains(".xml"))
    return out.withColumn("band_rank", band_rank(F.col("band"), bands))


def stack_bands(band_rasters: DataFrame, n_bands: int = 4) -> DataFrame:
    """Op 42: per-scene channel stack. Input rows (scene, band_rank,
    height, width, pixels) -> one row per scene with bands as an ordered
    array of flattened per-band arrays + dims.

    Scenes missing bands (or with inconsistent dims) are dropped — the
    reference would silently mis-stack or throw per scene
    (main_function_beta.py:160-163 swallows errors); here the filter is
    explicit. One shuffle on scene, partial-aggregated map-side.

    The dims-consistency check is min(struct) == max(struct), NOT
    count_distinct: a distinct aggregate alongside collect_list makes
    Catalyst rewrite the whole aggregation through an Expand (row
    duplication) + two-phase plan, so every PIXEL PAYLOAD rode the
    expand and double buffering — measured at the 10x scale probe
    (scripts/bench_scale.py) as a guaranteed heap death at 1000 scenes
    (1 GB / local[8]) while the min/max form finishes in ~15 s on the
    same data. min==max over (height, width) structs is the same
    predicate with plain aggregates."""
    dims = F.struct("height", "width")
    stacked = (
        band_rasters.groupBy("scene")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("band_rank", "pixels"))
            ).alias("ranked"),
            F.min(dims).alias("_dmin"),
            F.max(dims).alias("_dmax"),
        )
        .filter(
            (F.size("ranked") == n_bands) & (F.col("_dmin") == F.col("_dmax"))
        )
    )
    return stacked.select(
        "scene",
        F.col("_dmin.height").alias("height"),
        F.col("_dmin.width").alias("width"),
        F.transform(F.col("ranked"), lambda s: s["pixels"]).alias("bands"),
    )
