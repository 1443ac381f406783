"""Crop-engine correctness vs a NumPy oracle.

The oracle below reimplements the studied behavior of the reference's
``little_pair`` (data_pair/fct_data_extraction.py:29-157) — including
the as-built quirks (count-based bounds, mixed inf denominator, row/col
band purge, mutating-list cursor walk) — on FIXTURES.md-shaped synthetic
rasters (batch=12, scale=3, pct=0.7, HR 60x60, LR 20x20, planted
zero/-9999/inf contamination). The Spark pipeline must agree on
candidate sets, per-candidate quality flags, greedy-kept centers, and
exact crop pixel values.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sentinel_landsat_database_creation_spark.operators.crops import (
    NODATA,
    candidate_centers,
    quality_flag,
    slice_crop_pairs,
    suppress_overlap_greedy,
    suppress_overlap_grid,
)

BATCH, SCALE, PCT = 12, 3, 0.7
HR_N, LR_N = 60, 20
N_BANDS = 4


# ---------------------------------------------------------------------------
# fixtures


def _hr() -> np.ndarray:
    b, r, c = np.meshgrid(
        np.arange(N_BANDS), np.arange(HR_N), np.arange(HR_N), indexing="ij"
    )
    hr = (((b + 1) * 1000 + r * HR_N + c) % 997) / 997.0 + 0.001
    hr = hr.astype(np.float32)
    hr[0, 18:29, 12:23] = 0.0  # zero patch: fails >=99% nonzero nearby
    hr[1, 40:45, 40:45] = np.inf  # inf patch: fails <=1% inf nearby
    return hr


def _lr() -> np.ndarray:
    b, r, c = np.meshgrid(
        np.arange(N_BANDS), np.arange(LR_N), np.arange(LR_N), indexing="ij"
    )
    lr = (((b + 2) * 500 + r * LR_N + c) % 499) / 499.0 + 0.001
    lr = lr.astype(np.float32)
    lr[2, 5:8, 10:13] = NODATA  # nodata patch: fails <=1% -9999 nearby
    return lr


def _mask() -> np.ndarray:
    m = np.zeros((HR_N, HR_N), dtype=np.int32)
    for r in range(3, 55):  # diagonal-ish centerline, some near-border
        m[r, min(r + (r % 3), HR_N - 1)] = 1
    m[2, 2] = 1  # must be rejected by the bounds filter
    return m


# ---------------------------------------------------------------------------
# NumPy oracle (reference semantics, compat quirks included)


def oracle_candidates(mask: np.ndarray):
    r_tmp, c_tmp = np.where(mask == 1)
    half = BATCH // 2
    upper_c = len(c_tmp) - 1 - half
    upper_r = len(r_tmp) - 1 - half
    out = []
    for i in range(len(r_tmp)):
        if (
            r_tmp[i] > half
            and c_tmp[i] > half
            and r_tmp[i] < upper_r
            and c_tmp[i] < upper_c
        ):
            out.append((int(r_tmp[i]), int(c_tmp[i])))
    return out


def oracle_quality(hr: np.ndarray, lr: np.ndarray, rr: int, cc: int) -> bool:
    half = BATCH // 2
    r1, r2, c1, c2 = rr - half, rr + half, cc - half, cc + half
    crop1 = hr[:, r1:r2, c1:c2]
    crop2 = lr[:, r1 // SCALE : r2 // SCALE, c1 // SCALE : c2 // SCALE]
    n = N_BANDS
    b, bs = BATCH, BATCH // SCALE
    pz1 = np.count_nonzero(crop1) * 100 / (b * b * n)
    pz2 = np.count_nonzero(crop2) * 100 / (bs * bs * n)
    p9 = np.sum(crop2 == NODATA) * 100 / (bs * bs * n)
    pinf = np.sum(np.isinf(crop1)) * 100 / (bs * b * n)  # as-built mix
    return bool(pz1 >= 99 and pz2 >= 99 and p9 <= 1 and pinf <= 1)


def oracle_walk(cands, ok_fn, overlap=True):
    r = [x[0] for x in cands]
    c = [x[1] for x in cands]
    kept = []
    i = -1
    while len(r) > 0:
        i += 1
        rr, cc = r[i], c[i]
        if ok_fn(rr, cc):
            kept.append((rr, cc))
            if overlap:
                a = rr + BATCH * PCT
                b = cc + BATCH * PCT
                keep = [not (a <= v <= b) for v in r]
                r = [v for v, k in zip(r, keep) if k]
                c = [v for v, k in zip(c, keep) if k]
                keep = [not (a <= v <= b) for v in c]
                r = [v for v, k in zip(r, keep) if k]
                c = [v for v, k in zip(c, keep) if k]
        if i >= len(r) - 1:
            break
    return kept


# ---------------------------------------------------------------------------
# Spark pipeline fixtures


@pytest.fixture(scope="module")
def pipeline(spark):
    hr, lr, mask = _hr(), _lr(), _mask()
    mask_df = spark.createDataFrame(
        [("m1", HR_N, HR_N, [int(v) for v in mask.ravel()])],
        "mask_id string, height int, width int, pixels array<int>",
    )
    pairs_df = spark.createDataFrame(
        [
            (
                1,
                [hr[i].ravel().tolist() for i in range(N_BANDS)],
                HR_N,
                [lr[i].ravel().tolist() for i in range(N_BANDS)],
                LR_N,
            )
        ],
        "pair_id long, hr_bands array<array<float>>, hr_width int, "
        "lr_bands array<array<float>>, lr_width int",
    )
    centers = candidate_centers(mask_df, BATCH, compat_bounds=True)
    sliced = slice_crop_pairs(pairs_df, centers, BATCH, SCALE)
    flagged = sliced.withColumn(
        "ok", quality_flag(BATCH, SCALE, N_BANDS, compat=True)
    )
    return hr, lr, mask, flagged


def test_candidate_centers_match_oracle(pipeline, spark):
    hr, lr, mask, flagged = pipeline
    got = sorted(
        (r["r"], r["c"]) for r in flagged.select("r", "c").distinct().collect()
    )
    assert got == sorted(oracle_candidates(mask))


def test_quality_flags_match_oracle(pipeline):
    hr, lr, mask, flagged = pipeline
    rows = flagged.select("r", "c", "ok").collect()
    assert len(rows) > 0
    n_fail = sum(1 for r in rows if not r["ok"])
    assert 0 < n_fail < len(rows), "fixture must exercise both outcomes"
    for row in rows:
        assert row["ok"] == oracle_quality(hr, lr, row["r"], row["c"]), (
            row["r"],
            row["c"],
        )


def test_crop_pixels_exact(pipeline):
    hr, lr, mask, flagged = pipeline
    half = BATCH // 2
    for row in flagged.orderBy("ord").limit(5).collect():
        rr, cc = row["r"], row["c"]
        exp_hr = hr[:, rr - half : rr + half, cc - half : cc + half]
        got_hr = np.array(row["hr_crop"], dtype=np.float32).reshape(
            N_BANDS, BATCH, BATCH
        )
        assert np.array_equal(exp_hr, got_hr, equal_nan=True)
        r1, c1 = (rr - half) // SCALE, (cc - half) // SCALE
        s = BATCH // SCALE
        exp_lr = lr[:, r1 : r1 + s, c1 : c1 + s]
        got_lr = np.array(row["lr_crop"], dtype=np.float32).reshape(
            N_BANDS, s, s
        )
        assert np.array_equal(exp_lr, got_lr)


def test_greedy_suppression_matches_oracle(pipeline):
    hr, lr, mask, flagged = pipeline
    kept = suppress_overlap_greedy(flagged, BATCH, PCT)
    got = sorted((r["r"], r["c"]) for r in kept.collect())
    expect = sorted(
        oracle_walk(
            oracle_candidates(mask), lambda r, c: oracle_quality(hr, lr, r, c)
        )
    )
    assert got == expect
    assert len(got) > 0


def test_greedy_no_overlap_keeps_all_passing(pipeline):
    hr, lr, mask, flagged = pipeline
    kept = suppress_overlap_greedy(flagged, BATCH, PCT, overlap=False)
    got = sorted((r["r"], r["c"]) for r in kept.collect())
    expect = sorted(
        oracle_walk(
            oracle_candidates(mask),
            lambda r, c: oracle_quality(hr, lr, r, c),
            overlap=False,
        )
    )
    assert got == expect


def test_grid_suppression_properties(pipeline):
    hr, lr, mask, flagged = pipeline
    kept = suppress_overlap_grid(flagged, BATCH, PCT)
    rows = [(r["r"], r["c"]) for r in kept.collect()]
    assert len(rows) > 0
    stride = int(BATCH * PCT)
    cells = {(r // stride, c // stride) for r, c in rows}
    assert len(cells) == len(rows), "one survivor per grid cell"
    for r, c in rows:
        assert oracle_quality(hr, lr, r, c)


def test_shuffle_variant_deterministic(pipeline):
    hr, lr, mask, flagged = pipeline
    a = sorted(
        (r["r"], r["c"])
        for r in suppress_overlap_greedy(
            flagged, BATCH, PCT, shuffle_seed=42
        ).collect()
    )
    b = sorted(
        (r["r"], r["c"])
        for r in suppress_overlap_greedy(
            flagged, BATCH, PCT, shuffle_seed=42
        ).collect()
    )
    assert a == b and len(a) > 0


def test_mask_keyed_pairs_do_not_leak_centers(spark):
    """Two masks, two pairs keyed by mask_id: each pair must meet ONLY
    its own mask's centers (VERDICT r1 item 5 — unkeyed, a second mask
    handed every pair the union of all centers)."""
    # mask A: centerline at row 4; mask B: centerline at column 5
    import numpy as np

    def mask_pixels(kind):
        m = np.zeros((HR_N, HR_N), dtype=int)
        if kind == "row":
            m[20, 10:50] = 1
        else:
            m[10:50, 25] = 1
        return [int(v) for v in m.ravel()]

    masks = spark.createDataFrame(
        [
            ("mA", HR_N, HR_N, mask_pixels("row")),
            ("mB", HR_N, HR_N, mask_pixels("col")),
        ],
        "mask_id string, height int, width int, pixels array<int>",
    )
    hr, lr = _hr(), _lr()
    pairs = spark.createDataFrame(
        [
            (
                1,
                "mA",
                [hr[i].ravel().tolist() for i in range(N_BANDS)],
                HR_N,
                [lr[i].ravel().tolist() for i in range(N_BANDS)],
                LR_N,
            ),
            (
                2,
                "mB",
                [hr[i].ravel().tolist() for i in range(N_BANDS)],
                HR_N,
                [lr[i].ravel().tolist() for i in range(N_BANDS)],
                LR_N,
            ),
        ],
        "pair_id long, mask_id string, hr_bands array<array<float>>, "
        "hr_width int, lr_bands array<array<float>>, lr_width int",
    )
    centers = candidate_centers(masks, BATCH, compat_bounds=False)
    by_mask = {
        mid: {(r["r"], r["c"]) for r in rows}
        for mid, rows in (
            ("mA", centers.filter(centers.mask_id == "mA").collect()),
            ("mB", centers.filter(centers.mask_id == "mB").collect()),
        )
    }
    assert by_mask["mA"] and by_mask["mB"] and by_mask["mA"] != by_mask["mB"]

    sliced = slice_crop_pairs(pairs, centers, BATCH, SCALE)
    got = {
        pid: {(r["r"], r["c"]) for r in rows}
        for pid, rows in (
            (1, sliced.filter(sliced.pair_id == 1).collect()),
            (2, sliced.filter(sliced.pair_id == 2).collect()),
        )
    }
    assert got[1] == by_mask["mA"], "pair 1 must see only mask A centers"
    assert got[2] == by_mask["mB"], "pair 2 must see only mask B centers"
