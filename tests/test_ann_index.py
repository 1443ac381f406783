"""Persisted IVFADC index lifecycle (operators/ann_index.py): the
write -> append -> delete -> probe cycle answered from the files, held
to the session-scoped trained stack it materializes.

Independence discipline: the probe's ADC ranking is checked against
ivfpq_topk_trained's ranking over the same corpus/quantizers (whose
own correctness is driver-hashed against the composed k-means + PQ +
probe DuckDB oracle), and the maintenance properties (append
equivalence, ghost-freeness after delete, geometry refusal) are
checked from the file contents directly."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sentinel_landsat_database_creation_spark.operators.ann_index import (
    ann_index_append,
    ann_index_delete,
    ann_index_format,
    ann_index_probe,
    ann_index_write,
)
from sentinel_landsat_database_creation_spark.operators.similarity import (
    train_centroids,
    train_pq_codebooks,
)
from sentinel_landsat_database_creation_spark.sources.testdata import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def quantizers(spark):
    e = table(spark, SF, "embeddings")
    coarse = train_centroids(e, n_centroids=8, n_iters=2)
    cb = train_pq_codebooks(e, m=4, n_sub_centroids=8, n_iters=2)
    return e, coarse, cb


def test_probe_matches_trained_stack(spark, quantizers, tmp_path):
    """A full-corpus index probed at the same (k, nprobe) must rank
    exactly as ivfpq_topk_trained's ADC phase: same qids, same cids,
    same ranks (the trained entry's cosine rerank only APPENDS a float
    column to the same rows)."""
    from sentinel_landsat_database_creation_spark.operators.similarity import (
        ivfpq_topk_trained,
    )

    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    q = e.filter(F.col("vec_id") < 5)
    got = {
        (r["qid"], r["rnk"]): r["cid"]
        for r in ann_index_probe(spark, q, p, k=3, nprobe=2).collect()
    }
    want = {
        (r["qid"], r["rnk"]): r["cid"]
        for r in ivfpq_topk_trained(
            e, q, coarse, cb, k=3, m=4, nprobe=2
        ).collect()
    }
    assert got == want and got


def test_append_equals_whole_write(spark, quantizers, tmp_path):
    """write(gen1) + append(gen2) must hold exactly the code rows of
    write(gen1 UNION gen2) — appends encode with the PERSISTED
    quantizers, so the split can't drift the codes."""
    e, coarse, cb = quantizers
    gen1 = e.filter(F.col("vec_id") % 2 == 1)
    gen2 = e.filter(F.col("vec_id") % 2 == 0)
    p_split = str(tmp_path / "split")
    p_whole = str(tmp_path / "whole")
    ann_index_write(gen1, p_split, coarse, cb, m=4)
    ann_index_append(gen2, p_split)
    ann_index_write(e, p_whole, coarse, cb, m=4)
    a = sorted(
        map(tuple, spark.read.parquet(f"{p_split}/codes").collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(f"{p_whole}/codes").collect())
    )
    assert a == b and a


def test_delete_erases_and_compacts(spark, quantizers, tmp_path):
    """After ann_index_delete no code row of a tombstoned id survives
    (ghost-freeness read from the post-swap files), every other row is
    intact, probes stop returning the deleted ids, and no swap sibling
    is left behind."""
    import os

    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    before = sorted(map(tuple, spark.read.parquet(f"{p}/codes").collect()))
    tomb = e.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    tomb_ids = {r["vec_id"] for r in tomb.collect()}
    assert tomb_ids, "fixture must tombstone something"
    ann_index_delete(spark, p, tomb)
    after = sorted(map(tuple, spark.read.parquet(f"{p}/codes").collect()))
    assert not any(r[1] in tomb_ids for r in after)
    assert after == [r for r in before if r[1] not in tomb_ids]
    assert not os.path.isdir(f"{p}/codes__compacting")
    assert not os.path.isdir(f"{p}/codes__old")
    q = e.filter(F.col("vec_id") < 5)
    hits = ann_index_probe(spark, q, p, k=3, nprobe=2).collect()
    assert hits and not any(r["cid"] in tomb_ids for r in hits)


def test_geometry_mismatch_refused(spark, quantizers, tmp_path):
    """A batch or probe whose embedding dim disagrees with the sidecar
    raises instead of landing/scoring cross-geometry codes; a
    non-index dir raises before any rewrite."""
    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    fmt = ann_index_format(p)
    assert (fmt["m"], fmt["d"], fmt["k_coarse"]) == (4, 64, 8)
    short = e.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="geometr"):
        ann_index_append(short, p)
    with pytest.raises(ValueError, match="geometr"):
        ann_index_probe(spark, short.limit(2), p)
    with pytest.raises(ValueError, match="_ann_format"):
        ann_index_delete(
            spark, str(tmp_path / "nonindex"), e.select("vec_id")
        )


def test_probe_plan_prunes_and_stays_two_phase(spark, quantizers, tmp_path):
    """The scale contract in the plan: the probed-cell filter reaches
    the codes scan as a pushed filter (row-group pruning on the sorted
    cell column), and the ranking keeps Spark's two-phase
    WindowGroupLimit pushdown (the pq_topk lesson — a config change
    would silently serialize the reducer)."""
    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    q = e.filter(F.col("vec_id") < 5)
    plan = (
        ann_index_probe(spark, q, p, k=3, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan and any("In(cell" in ln for ln in scan), plan
    assert "WindowGroupLimit" in plan, plan


def test_empty_probe_and_append_after_delete(spark, quantizers, tmp_path):
    """Lifecycle edges: probing with an empty query set returns an
    empty frame (the isin([]) filter short-circuits, no job explosion);
    appending AFTER a delete lands beside the swap-rewritten files and
    probes read the union — the standing maintenance cycle
    (delete ghosts, re-ingest survivors) must not corrupt the layout."""
    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    gen1 = e.filter(F.col("vec_id") % 2 == 1)
    gen2 = e.filter(F.col("vec_id") % 2 == 0)
    ann_index_write(gen1, p, coarse, cb, m=4)

    empty_q = e.filter(F.col("vec_id") < 0)
    assert ann_index_probe(spark, empty_q, p, k=3, nprobe=2).count() == 0
    # empty ingest batch: a no-op, not a crash or a phantom file set
    n_before = spark.read.parquet(f"{p}/codes").count()
    ann_index_append(empty_q, p)
    assert spark.read.parquet(f"{p}/codes").count() == n_before

    tomb = gen1.filter(F.col("vec_id") % 5 == 1).select("vec_id")
    ann_index_delete(spark, p, tomb)
    ann_index_append(gen2, p)
    got = sorted(map(tuple, spark.read.parquet(f"{p}/codes").collect()))

    p2 = str(tmp_path / "direct")
    tomb_ids = {r["vec_id"] for r in tomb.collect()}
    survivors = e.filter(~F.col("vec_id").isin(sorted(tomb_ids)))
    ann_index_write(survivors, p2, coarse, cb, m=4)
    want = sorted(map(tuple, spark.read.parquet(f"{p2}/codes").collect()))
    assert got == want and got


def test_exact_rerank_matches_trained_stack(spark, quantizers, tmp_path):
    """probe + exact_rerank must equal ivfpq_topk_trained row for row
    (same candidate set by construction — the parity test above — so
    the rerank's cosine arithmetic and (cos desc, cid) re-ranking are
    the only new math, and they must reproduce the trained stack's
    output contract exactly)."""
    from sentinel_landsat_database_creation_spark.operators.ann_index import (
        exact_rerank,
    )
    from sentinel_landsat_database_creation_spark.operators.similarity import (
        ivfpq_topk_trained,
    )

    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    q = e.filter(F.col("vec_id") < 5)
    topk = ann_index_probe(spark, q, p, k=3, nprobe=2)
    got = [
        tuple(r)
        for r in exact_rerank(topk, q, e).orderBy("qid", "rnk").collect()
    ]
    want_df = ivfpq_topk_trained(e, q, coarse, cb, k=3, m=4, nprobe=2)
    # the trained stack keeps ADC rank order; re-rank its rows by
    # (cos desc, cid) to state the shared contract
    import itertools

    rows = sorted(
        ((r["qid"], -r["cos"], r["cid"], r["cos"]) for r in want_df.collect())
    )
    want = []
    for qid, grp in itertools.groupby(rows, key=lambda t: t[0]):
        for i, (_q, _nc, cid, cos) in enumerate(grp, start=1):
            want.append((qid, i, cid, cos))
    assert got == want and got


def test_exact_rerank_broadcasts_survivors(spark, quantizers, tmp_path):
    """The corpus-vector attach must build from the broadcast survivor
    set — a sort-merge join here would shuffle every corpus row's raw
    embedding, the exact cost the two-stage design exists to avoid
    (the hint must wrap the corpus join's immediate child; a hint on
    topk alone does not survive the first join)."""
    from sentinel_landsat_database_creation_spark.operators.ann_index import (
        exact_rerank,
    )

    e, coarse, cb = quantizers
    p = str(tmp_path / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    q = e.filter(F.col("vec_id") < 5)
    topk = ann_index_probe(spark, q, p, k=3, nprobe=2)
    plan = (
        exact_rerank(topk, q, e)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
