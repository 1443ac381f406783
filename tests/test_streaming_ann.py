"""Streaming ANN radius probe (streaming/ann_delta.py) against the
persisted IVFADC index: the stateless plan must (a) reproduce the
batch probe's exact ADC integers, (b) implement radius semantics
exactly (every candidate within r, none outside), and (c) run as a
real Structured Streaming drain with output equal to the same
function applied to the batch frame."""

from __future__ import annotations

import sys
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sentinel_landsat_database_creation_spark.operators.ann_index import (
    ann_index_probe,
    ann_index_write,
)
from sentinel_landsat_database_creation_spark.operators.similarity import (
    train_centroids,
    train_pq_codebooks,
)
from sentinel_landsat_database_creation_spark.sources.testdata import table
from sentinel_landsat_database_creation_spark.streaming.ann_delta import (
    ann_radius_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    e = table(spark, SF, "embeddings")
    coarse = train_centroids(e, n_centroids=8, n_iters=2)
    cb = train_pq_codebooks(e, m=4, n_sub_centroids=8, n_iters=2)
    p = str(tmp_path_factory.mktemp("ann") / "annidx")
    ann_index_write(e, p, coarse, cb, m=4)
    return p


def test_radius_matches_batch_probe_scores(spark, index_path):
    """At a radius above every candidate distance, the radius set is
    exactly the batch probe's candidate set at huge k, ADC integers
    identical — the stateless row-local LUT fold reproduces the batch
    LUT-join sum bit for bit."""
    e = table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    full = ann_index_probe(spark, q, index_path, k=10**6, nprobe=2)
    want = {
        (r["qid"], r["cid"]): r["adc"] for r in full.collect()
    }
    assert want
    big = max(want.values()) + 1
    got = {
        (r["qid"], r["cid"]): r["adc"]
        for r in ann_radius_stream(
            q, spark, index_path, radius=big, nprobe=2
        ).collect()
    }
    assert got == want

    # a median radius keeps exactly the within-r subset
    r_med = sorted(want.values())[len(want) // 2]
    got_med = {
        (r["qid"], r["cid"])
        for r in ann_radius_stream(
            q, spark, index_path, radius=r_med, nprobe=2
        ).collect()
    }
    want_med = {k for k, v in want.items() if v <= r_med}
    assert got_med == want_med and got_med and got_med != set(want)


def test_streamed_equals_batch(spark, index_path, tmp_path):
    """The same plan drained as a real availableNow stream (parquet
    source -> memory sink) emits exactly the batch invocation's rows —
    and the plan is legal append-mode streaming (no state, no window;
    the start() itself proves it)."""
    e = table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 7).select("vec_id", "embedding")
    src = str(tmp_path / "qstream")
    q.write.parquet(src)

    batch = {
        (r["qid"], r["cid"], r["adc"])
        for r in ann_radius_stream(
            q, spark, index_path, radius=10**12, nprobe=2
        ).collect()
    }
    assert batch

    reader = spark.readStream.schema(q.schema).parquet(src)
    out = ann_radius_stream(
        reader, spark, index_path, radius=10**12, nprobe=2
    )
    assert out.isStreaming
    name = f"ann_radius_{uuid.uuid4().hex[:8]}"
    (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    streamed = {
        (r["qid"], r["cid"], r["adc"])
        for r in spark.table(name).collect()
    }
    assert streamed == batch


def test_query_dimension_mismatch_raises(spark, index_path):
    """A query vector whose dimension disagrees with the index must
    raise at execution (the batch probe's geometry refusal, in-plan) —
    without the guard it would NULL-pad through zip_with and silently
    emit nothing forever."""
    e = table(spark, SF, "embeddings")
    short = e.filter(F.col("vec_id") < 3).select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(Exception, match="dimension != index"):
        ann_radius_stream(
            short, spark, index_path, radius=10**12, nprobe=2
        ).collect()


def test_radius_matches_duckdb_oracle(spark, tmp_path):
    """The staged r14 oracle (_sql_ann_radius) against the streaming
    plan TODAY: a full-corpus index at the fragment generators' grid
    (K=16 coarse, k*=16 PQ — the registry configuration), queries
    vec_id < 5, radius at the candidate median so kept AND dropped
    rows both decide the comparison. Proves the r14 entry needs only
    a registry row."""
    import duckdb

    from sentinel_landsat_database_creation_spark.plans.driver_queries_ext import (
        _sql_ann_radius,
    )

    e = table(spark, SF, "embeddings")
    coarse = train_centroids(e, n_centroids=16, n_iters=2)
    cb = train_pq_codebooks(e, m=4, n_sub_centroids=16, n_iters=2)
    p = str(tmp_path / "annidx16")
    ann_index_write(e, p, coarse, cb, m=4)
    q = e.filter(F.col("vec_id") < 5)

    all_rows = ann_radius_stream(
        q, spark, p, radius=10**15, nprobe=2
    ).collect()
    assert all_rows
    r_med = sorted(r["adc"] for r in all_rows)[len(all_rows) // 2]
    got = sorted(
        (r["qid"], r["cid"], r["adc"])
        for r in ann_radius_stream(
            q, spark, p, radius=r_med, nprobe=2
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            _sql_ann_radius(int(r_med), ksub=16, n_coarse=16, nprobe=2)
        ).fetchall()
    ]
    assert got == want and got and len(got) < len(all_rows)
