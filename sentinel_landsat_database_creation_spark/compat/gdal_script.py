"""Op 9 — gdalwarp crop-script generation (SURVEY.md §2.1 op 9).

The reference's ``data_crop.crop`` (reference data_pair/
fct_data_extraction.py:165-211) walks two scene roots and appends one
``gdalwarp -cutline <gpkg> -crop_to_cutline <in> <out>`` line per band
file to a bash script that a human runs under a GDAL conda env. Scene
paths there are hard-coded; here the same lines derive declaratively
from a file-listing DataFrame, so generation distributes and the script
is just a text sink of the result.

As-built asymmetry preserved (same citations): the Landsat side keeps
files with ``".tif" in name and ".xml" not in name`` and writes
``<dst>/<scene>/<file>``; the Sentinel-2 side keeps ``".xml" not in
name`` and appends a literal ``".tif"`` to the output name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crop_script_lines(
    listing: DataFrame,
    cutline_gpkg: str,
    src_root: str,
    dst_root: str,
    sensor: str,
) -> DataFrame:
    """One ``gdalwarp`` line per surviving band file.

    ``listing`` has columns (scene, file). ``sensor`` is "landsat" or
    "s2" and selects the reference's per-side filter + output-name rule.
    Returns (scene, file, line) ordered by (scene, file) — the
    reference's os.listdir walk order is OS-dependent; sorting makes the
    script deterministic (documented divergence).
    """
    if sensor == "landsat":
        keep = F.col("file").contains(".tif") & ~F.col("file").contains(".xml")
        out_name = F.col("file")
    elif sensor == "s2":
        keep = ~F.col("file").contains(".xml")
        out_name = F.concat(F.col("file"), F.lit(".tif"))
    else:
        raise ValueError(f"unknown sensor: {sensor!r}")

    in_path = F.concat_ws("/", F.lit(src_root), F.col("scene"), F.col("file"))
    out_path = F.concat_ws("/", F.lit(dst_root), F.col("scene"), out_name)
    line = F.concat_ws(
        " ",
        F.lit("gdalwarp -cutline"),
        F.lit(cutline_gpkg),
        F.lit("-crop_to_cutline"),
        in_path,
        out_path,
    )
    return (
        listing.filter(keep)
        .select("scene", "file", line.alias("line"))
        .orderBy("scene", "file")
    )
