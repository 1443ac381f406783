"""Raster sources: binary scene listings + GeoTIFF decode (SURVEY.md §2
ops 1/2/4/8).

The decode step is the engine's one mandatory pandas-UDF boundary
(SURVEY.md §2.10): GeoTIFF bytes -> flattened float pixels. rasterio is
not available in this container, so the real decoder is gated behind an
import-try; the Spark-side plumbing (binaryFile scan, schema, Arrow
batching, partition shape) is real and exercised in tests through
``decode_fake`` — a deterministic stand-in keyed on file path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._serde import register_self
from ..schemas import BAND_RASTER_SCHEMA

register_self(__name__)

try:  # pragma: no cover - not installed in the test container
    import rasterio  # type: ignore

    HAVE_RASTERIO = True
except ImportError:
    rasterio = None
    HAVE_RASTERIO = False


def scene_file_listing(spark: SparkSession, root: str) -> DataFrame:
    """Ops 1/2: distributed directory scan via the binaryFile source —
    file metadata only (pixel bytes load lazily per partition). Scene
    and band fall out of the path with regexes."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tif")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)/[^/]+$", 1).alias("scene"),
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("filename"),
        "path",
        "length",
        "content",
    )


def _decode_batches(batches, decode_one) -> Iterator:
    import pandas as pd

    for pdf in batches:
        out = {"scene": [], "band": [], "height": [], "width": [], "pixels": []}
        for _, row in pdf.iterrows():
            h, w, px = decode_one(row)
            out["scene"].append(row["scene"])
            out["band"].append(row["band"])
            out["height"].append(h)
            out["width"].append(w)
            out["pixels"].append(px)
        yield pd.DataFrame(out)


def decode_rasters(band_files: DataFrame) -> DataFrame:
    """Op 4: GeoTIFF band-1 decode as mapInPandas over Arrow batches.

    Requires rasterio (absent here): raises NotImplementedError at plan
    build when unavailable, per the container contract."""
    if not HAVE_RASTERIO:  # pragma: no cover
        raise NotImplementedError(
            "rasterio is not installed in this environment; use "
            "decode_fake() for plumbing tests"
        )

    def run(batches):  # pragma: no cover
        def one(row):
            import io

            with rasterio.open(io.BytesIO(row["content"])) as src:
                arr = src.read(1).astype("float32")
            return arr.shape[0], arr.shape[1], arr.ravel().tolist()

        return _decode_batches(batches, one)

    cols = band_files.select("scene", "band", "content")
    return cols.mapInPandas(run, BAND_RASTER_SCHEMA)


def encode_rasters(rasters: DataFrame, out_dir: str) -> None:
    """Op 8 (``array2raster``): write 1-band float32 GeoTIFFs from pixel
    array rows. Unused by the reference's main flow (SURVEY.md §2 op 8)
    and requires rasterio — explicit stub in this container; the Parquet
    sink is the engine-native raster output."""
    raise NotImplementedError(
        "GeoTIFF encode requires rasterio (absent here); persist rasters "
        "with df.write.parquet — the engine-native sink"
    )


def decode_fake(band_files: DataFrame, height: int, width: int) -> DataFrame:
    """Deterministic decode stand-in: pixels derived from md5(scene/band)
    via the same mapInPandas plumbing (schema, Arrow batches, partition
    shape) the real decoder uses."""

    def run(batches):
        import hashlib

        def one(row):
            seed_bytes = hashlib.md5(
                f"{row['scene']}/{row['band']}".encode()
            ).digest()
            seed = int.from_bytes(seed_bytes[:4], "big")
            n = height * width
            px = [((seed + 2654435761 * i) % 1000) / 1000.0 + 0.001 for i in range(n)]
            return height, width, px

        return _decode_batches(batches, one)

    cols = band_files.select("scene", "band")
    return cols.mapInPandas(run, BAND_RASTER_SCHEMA)
