"""Stage 4 — the crop engine (reference E4, SURVEY.md §2 ops 13/14/20/26/
33/34/35/43/44).

The reference's ``little_pair`` walks a centerline mask sequentially,
slicing aligned HR/LR crops and filtering them by data-quality
percentages (data_pair/fct_data_extraction.py:29-157). Here the same
semantics decompose into set-based DataFrame stages, each embarrassingly
parallel at 100 TB:

  mask -> candidate centers (posexplode + bounds filter)     [op 35+13]
       x scene pairs -> per-band HR/LR slices (native exprs) [ops 43/44/20]
       -> quality predicate (higher-order array counts)      [ops 14/26]
       -> overlap suppression: compat greedy walk (per-group
          applyInPandas over centers only — never pixels) or
          native grid-bucket dedup                           [ops 33/34]

Compat quirks reproduced exactly (flagged, never silently):
- bounds filter upper limits come from the COUNT of centerline points,
  not the raster dims (fct_data_extraction.py:62-64);
- the inf-percentage denominator mixes LR height with HR width
  (fct_data_extraction.py:133);
- greedy no_overlap uses a = r + batch*pct and b = c + batch*pct, and
  purges rows-in-[a,b] then cols-in-[a,b] in two passes over the
  mutating candidate list (fct_data_extraction.py:75-88,143-150); the
  walk advances one index per iteration over that mutating list and
  stops when the cursor passes the tail (:153-155).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.arrays import (
    count_equal,
    count_inf,
    count_nonzero,
    slice2d,
    sum_over_bands,
)

from .._serde import register_self

register_self(__name__)

NODATA = -9999.0


def candidate_centers(
    mask: DataFrame, batch_size: int, compat_bounds: bool = True
) -> DataFrame:
    """Ops 35+13: centerline pixels == 1, bounds-filtered, in np.where
    row-major order (column ``ord`` preserves it for the greedy walk).

    compat_bounds=True reproduces the reference's as-built upper limits
    (count of centerline points, fct_data_extraction.py:62-64);
    False uses the geometrically-correct raster dims.
    """
    half = batch_size // 2
    pts = mask.select(
        "mask_id",
        "height",
        "width",
        F.posexplode("pixels").alias("p", "v"),
    ).filter(F.col("v") == 1)
    pts = pts.select(
        "mask_id",
        "height",
        "width",
        (F.col("p") / F.col("width")).cast("int").alias("r"),
        (F.col("p") % F.col("width")).cast("int").alias("c"),
        F.col("p").alias("ord"),
    )
    if compat_bounds:
        n_pts = pts.groupBy("mask_id").agg(F.count(F.lit(1)).alias("n_pts"))
        pts = pts.join(F.broadcast(n_pts), "mask_id")
        upper = F.col("n_pts") - 1 - half
        bounded = pts.filter(
            (F.col("r") > half)
            & (F.col("c") > half)
            & (F.col("r") < upper)
            & (F.col("c") < upper)
        ).drop("n_pts")
    else:
        bounded = pts.filter(
            (F.col("r") > half)
            & (F.col("c") > half)
            & (F.col("r") < F.col("height") - half)
            & (F.col("c") < F.col("width") - half)
        )
    return bounded.drop("height", "width")


def slice_crop_pairs(
    pairs: DataFrame,
    centers: DataFrame,
    batch_size: int,
    scale: int,
    centers_per_chunk: int = 512,
) -> DataFrame:
    """Ops 20/43/44: for every (scene pair x candidate center), slice the
    HR crop at [r±b/2, c±b/2] and the LR crop at the same coords // scale.

    ``pairs`` carries one row per scene pair: (pair_id, hr_bands,
    hr_width, lr_bands, lr_width) with bands as arrays of flattened
    row-major float arrays. The scale precondition (hr_w // lr_w ==
    scale, the reference's assert at :91) becomes a validation filter.

    Center matching, in precedence order: a ``pair_id`` column on
    ``centers`` keys each pair to exactly its own center list (the
    survivor-slicing second pass); else a ``mask_id`` column on
    ``pairs`` keys pairs to their mask's centers (broadcast equi-join —
    without the key a second mask would silently hand every pair the
    union of all masks' centers); else every pair shares the one
    centerline mask — the reference's as-built shape
    (fct_data_extraction.py:50,61 loads a single fixed mask).

    Output ``mask_id`` provenance in the by-pair branch: the centers'
    own ``mask_id`` if they carry one, else the pair row's, else the
    literal 1 (the single-shared-mask convention's id) when neither
    side knows a mask.

    Join shape, measured (round 4, volume fixture: 28 pairs x 256x256x4
    rasters x ~3.9k centers): a row-level join of pair rows against the
    centers TABLE is wrong at volume — every joined output row copies
    the pair's full band payload (~8 MB), ~900 GB of row-copy churn at
    1e5 crops, which OOMed a 1g heap before any crop was sliced. So the
    centers attach as ONE collected array per mask (broadcast; bounded
    by a single mask's centerline, metadata-scale), each pair row
    explodes into ceil(n/512)-center chunks (the only stage that copies
    band bytes — per chunk, not per center), and the slices evaluate
    inside a transform over the chunk, emitting only (ord, r, c,
    crops) structs (~5 KB). Per-task peak = one band payload + one
    chunk's crops; the 117k-crop fixture runs in the same 1g heap with
    headroom."""
    half = batch_size // 2
    lr_size = batch_size // scale
    valid = pairs.filter(
        (F.col("hr_width") / F.col("lr_width")).cast("int") == scale
    )
    ctr = F.struct(
        F.col("ord").alias("ord"), F.col("r").alias("r"), F.col("c").alias("c")
    )
    by_pair = "pair_id" in centers.columns
    if by_pair:
        if "mask_id" in centers.columns:
            # centers' own mask_id wins (they know which mask produced
            # each center list)
            packed = centers.groupBy("pair_id").agg(
                F.collect_list(ctr).alias("ctrs"),
                F.min("mask_id").alias("mask_id"),
            )
            grid = valid.drop("mask_id").join(F.broadcast(packed), "pair_id")
        elif "mask_id" in pairs.columns:
            # centers carry no mask_id: the pair's own mask_id survives
            # instead of being overwritten with a fabricated constant
            # (round-4 ADVICE — build_crop_dataset discards mask_id, but
            # other callers passing pair_id-keyed centers expect theirs)
            packed = centers.groupBy("pair_id").agg(
                F.collect_list(ctr).alias("ctrs")
            )
            grid = valid.join(F.broadcast(packed), "pair_id")
        else:
            # neither side knows a mask: fabricate the documented
            # placeholder (the single-shared-mask convention's id)
            packed = centers.groupBy("pair_id").agg(
                F.collect_list(ctr).alias("ctrs"),
                F.min(F.lit(1)).alias("mask_id"),
            )
            grid = valid.join(F.broadcast(packed), "pair_id")
    else:
        packed = centers.groupBy("mask_id").agg(
            F.collect_list(ctr).alias("ctrs")
        )
        if "mask_id" in pairs.columns:
            grid = valid.join(F.broadcast(packed), "mask_id")
        else:
            # single shared mask (or the union of all masks, each
            # keeping its id — the old row-level cross join's semantics)
            grid = valid.crossJoin(F.broadcast(packed))

    keep = ["pair_id", "mask_id"]
    n_chunks = F.ceil(F.size("ctrs") / F.lit(centers_per_chunk)).cast("int")
    chunked = grid.filter(F.size("ctrs") > 0).select(
        *keep,
        "hr_bands",
        "hr_width",
        "lr_bands",
        "lr_width",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda k: F.slice(
                    F.col("ctrs"),
                    k * centers_per_chunk + 1,
                    centers_per_chunk,
                ),
            )
        ).alias("chunk"),
    )

    def crop_struct(one: Column) -> Column:
        r0 = one["r"] - half
        c0 = one["c"] - half
        hr = F.transform(
            F.col("hr_bands"),
            lambda b: slice2d(
                b,
                F.col("hr_width"),
                r0,
                c0,
                F.lit(batch_size),
                F.lit(batch_size),
            ),
        )
        lr_r0 = (r0 / scale).cast("int")
        lr_c0 = (c0 / scale).cast("int")
        lr = F.transform(
            F.col("lr_bands"),
            lambda b: slice2d(
                b, F.col("lr_width"), lr_r0, lr_c0, F.lit(lr_size), F.lit(lr_size)
            ),
        )
        return F.struct(
            one["ord"].alias("ord"),
            one["r"].alias("r"),
            one["c"].alias("c"),
            hr.alias("hr_crop"),
            lr.alias("lr_crop"),
        )

    return chunked.select(
        "pair_id",
        "mask_id",
        F.explode(F.transform("chunk", crop_struct)).alias("cr"),
    ).select(
        "pair_id",
        "mask_id",
        F.col("cr.ord").alias("ord"),
        F.col("cr.r").alias("r"),
        F.col("cr.c").alias("c"),
        F.col("cr.hr_crop").alias("hr_crop"),
        F.col("cr.lr_crop").alias("lr_crop"),
    )


def quality_flag(
    batch_size: int, scale: int, n_bands: int = 4, compat: bool = True
) -> Column:
    """Op 14: the acceptance predicate over (hr_crop, lr_crop) columns.

    compat=True reproduces the as-built inf denominator (LR height x HR
    width x n, fct_data_extraction.py:133); False uses the HR pixel
    count. Percentage comparisons are restated as exact integer-count
    comparisons (count*100 >= 99*denom), so no float drift.
    """
    b, s = batch_size, scale
    hr_px = b * b * n_bands
    lr_px = (b // s) * (b // s) * n_bands
    inf_denom = (b // s) * b * n_bands if compat else hr_px

    nz_hr = sum_over_bands(F.col("hr_crop"), count_nonzero)
    nz_lr = sum_over_bands(F.col("lr_crop"), count_nonzero)
    nine_lr = sum_over_bands(F.col("lr_crop"), lambda a: count_equal(a, NODATA))
    inf_hr = sum_over_bands(F.col("hr_crop"), count_inf)

    return (
        (nz_hr * 100 >= 99 * hr_px)
        & (nz_lr * 100 >= 99 * lr_px)
        & (nine_lr * 100 <= 1 * lr_px)
        & (inf_hr * 100 <= 1 * inf_denom)
    )


# ---------------------------------------------------------------------------
# overlap suppression


def _greedy_walk(rows, batch_size: int, pct: float, overlap: bool):
    """Faithful reimplementation of the reference's mutating-list walk
    (fct_data_extraction.py:90-157): one cursor pass over the candidate
    list, purging row/col bands after each accepted crop. Operates on
    centers + precomputed quality flags only — pixels never enter Python.
    """
    r = [row[0] for row in rows]
    c = [row[1] for row in rows]
    ok = {(row[0], row[1]): row[2] for row in rows}
    kept = []
    i = -1
    while len(r) > 0:
        i += 1
        rr, cc = r[i], c[i]
        if ok[(rr, cc)]:
            kept.append((rr, cc))
            if overlap:
                a = rr + batch_size * pct
                b = cc + batch_size * pct
                keep = [not (a <= v <= b) for v in r]
                r = [v for v, k in zip(r, keep) if k]
                c = [v for v, k in zip(c, keep) if k]
                keep = [not (a <= v <= b) for v in c]
                r = [v for v, k in zip(r, keep) if k]
                c = [v for v, k in zip(c, keep) if k]
        if i >= len(r) - 1:
            break
    return kept


def suppress_overlap_greedy(
    flagged: DataFrame,
    batch_size: int,
    pct: float,
    overlap: bool = True,
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Op 33 (and 34): per scene-pair sequential greedy suppression via
    applyInPandas — parallel ACROSS pairs, faithful WITHIN a pair.

    Input needs (pair_id, r, c, ord, ok). Candidates walk in np.where
    order (``ord``), or in a seeded shuffled order when ``shuffle_seed``
    is set (the fct_data_extraction_shuffle.py variant, made
    reproducible). Returns kept (pair_id, r, c).
    """
    import pandas as pd

    schema = StructType(
        [
            StructField("pair_id", LongType(), False),
            StructField("r", IntegerType(), False),
            StructField("c", IntegerType(), False),
        ]
    )

    def walk(key, pdf):
        if shuffle_seed is not None:
            pdf = pdf.sample(frac=1.0, random_state=shuffle_seed + key[0])
        else:
            pdf = pdf.sort_values("ord")
        kept = _greedy_walk(
            list(zip(pdf["r"], pdf["c"], pdf["ok"])), batch_size, pct, overlap
        )
        return pd.DataFrame(
            {
                "pair_id": [key[0]] * len(kept),
                "r": [k[0] for k in kept],
                "c": [k[1] for k in kept],
            }
        )

    return (
        flagged.select("pair_id", "r", "c", "ord", "ok")
        .groupBy("pair_id")
        .applyInPandas(walk, schema)
    )


def suppress_overlap_grid(
    flagged: DataFrame, batch_size: int, pct: float, keep_payload: bool = False
) -> DataFrame:
    """Native-mode alternative to op 33: order-free grid-bucket dedup.
    Quality-passing centers bucket into stride-sized cells; the minimum
    (r, c) per cell survives. Set-based, deterministic, shuffle-friendly
    — the documented divergence from the sequential reference semantics.

    keep_payload=True returns the survivor's FULL input row (crop pixel
    columns included) via a per-cell row_number window instead of the
    groupBy-min + join-back the caller would otherwise need — one pass
    over the flagged rows, so the expensive slice/flag subtree isn't
    recomputed on the second side of a self-join (measured ~2x on the
    crop pipeline at sf0.1)."""
    from pyspark.sql.window import Window

    stride = max(int(batch_size * pct), 1)
    ok = flagged.filter(F.col("ok"))
    gr = (F.col("r") / stride).cast("int")
    gc = (F.col("c") / stride).cast("int")
    if keep_payload:
        w = Window.partitionBy(F.col("pair_id"), gr, gc).orderBy("r", "c")
        return (
            ok.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    cell = F.struct(gr.alias("gr"), gc.alias("gc"))
    return (
        ok.groupBy("pair_id", cell.alias("cell"))
        .agg(F.min(F.struct("r", "c")).alias("rc"))
        .select("pair_id", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    )
