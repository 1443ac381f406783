#!/usr/bin/env python
"""One measured decade of scaling (round-5 VERDICT item 5).

The engine's 100x claims are argued from plan shape (bucketed joins,
bounded per-group state, no global sorts) plus measured OOM stories;
this script grounds them with numbers: it builds a 10x synthetic of
the bench tables (sf0.1 -> "sf1"), runs the most expensive registry
queries at BOTH scale factors in identical fresh sessions (same
deliberate 1 GB local-mode heap), and reports the observed scaling
exponent per query: e = log10(t_sf1 / t_sf0.1), so e = 1.0 is perfect
linear scaling, < 1 is sublinear (fixed overheads amortizing), > 1 is
superlinear (a shape that would NOT survive 100x).

The 10x tables are structure-preserving, not naive copies — naive
duplication would square the near-dup pair space and measure a
different workload:

- documents: 10 copies; every TOKEN gets a copy-suffix
  (regexp_replace(text, '(\\S+)', '$1zK')), so within-copy shingle
  structure is isomorphic to the original (token and shingle counts
  unchanged, near-dup pairs exactly 10x) while cross-copy shingle
  overlap is zero. doc_id += K*1e6 preserves the %10/%2 batch splits.
- embeddings: 10 copies; each copy applies its own deterministic
  diagonal +-1 sign pattern. Within-copy dot products and norms are
  EXACTLY preserved (diag(s) is orthogonal), cross-copy cosines are
  sign-scrambled noise — near-dup pairs scale 10x, not 100x.
- events: 10 copies with user_id/event_id offsets — 10x users, each
  with the original per-user session structure.
- lineitem: 10 copies with key offsets (pure scan+agg scaling line).

The generated-fixture queries (crop_volume*, scene_tensors_volume)
scale through their params_for tier instead: sf>=0.5 selects 10x the
pair count at the same raster dims (~1M candidate crops / ~8000 band
files).

Writes BENCH_SCALE.json at the repo root. Offline experiment script —
fixed output path, run it by hand, not concurrently.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/slc_scaleup/sf1"
SF10 = "/tmp/slc_scaleup/sf10"
COPIES = 10

# Hash/shuffle-shaped queries: per-task state is rows of hashes and
# counters, so they run at 10x data in the SAME local[32] / 1 GB
# session the bench uses.
TABLE_QUERIES = [
    "minhash_lsh",
    "minhash_estimate",
    # r13: span_scrub retired into span_dedup's merged entry — the
    # removal twin always shared span_dedup's memo'd occurrence
    # stream; its extra state is per-DOCUMENT (window partitioned by
    # doc_id, ranges array bounded by doc length), so the merged
    # entry keeps the same hash/shuffle shape
    "span_dedup",
    # r7 (late): seeded shard+rank shuffle — one hash shuffle and a
    # per-SHARD window (n_shards is the per-task sort-state knob), no
    # global order anywhere
    "epoch_shuffle",
    "stream_sessions",
    "user_sessions",
    "pricing_summary",
    # r7's new documents-table operators, probed the round they land:
    # winnowing is row-local selection + hash-only dictionary rows,
    # pii_scrub a scan-speed regex projection (expect e near
    # normalized_dedup's per-byte-CPU ~1.0; that is the correct shape)
    "winnow_fingerprint",
    "pii_scrub",
    # r13: trained-BPE token counts + pack budgets — fixture-free
    # linear scans (explode, vocab-sized encode boundary, hash join,
    # per-shard window); the training collect is capped at top-64
    # words, constant in corpus size
    "bpe_token_checks",
]

# Memory-bound queries: per-task (or driver-broadcast) working sets
# grow with the data — raster payloads of 36-150 MB at sf1 for the
# volume fixtures, the 10x near-dup pair/label tables for the
# clustering pair. At 1 GB / 32 slots that is 32 MB per concurrent
# task, a ~100x leaner memory:core ratio than any production executor
# (measured failure modes at local[32]: netty direct-memory exhaustion
# in the Arrow encode stage, heap death in decode/stack, AQE broadcast
# build failure in the pair pipeline). The honest probe runs BOTH
# scale factors for these at local[8] — same 1 GB heap, 4x the
# per-slot memory, the knob a cluster turns by sizing executor memory
# per core — so each exponent compares identical conditions.
CAPPED_QUERIES = [
    "neardup_pipeline",
    "dedup_clusters",
    # r8: delta_neardup rides inside the lsh_delta_checks merge (same
    # probe plus the grown-index twin, pairwise-joined)
    "lsh_delta_checks",
    # r8: the small-side exact probe made containment a pair-space
    # query — the PPJoin-style cascade (containment_pairs docstring)
    # bounds the candidate blow-up, but the ~27M-group probe aggregate
    # at sf1 needs local[8]'s per-task memory share (32 uncapped slots
    # racing the 1 GB heap OOM'd; capped runs it in ~47 s)
    "containment_dedup",
    "crop_volume",
    "crop_volume_greedy",
    "scene_tensors_volume",
    # r7: the int16-DN + calibration pipeline (10x pairs at sf>=0.5 via
    # its params_for tier; the Python-LZW decode loop is the per-file
    # cost, the plan is the same one-boundary pair-parallel shape)
    "scene_tensors_int16",
    # r9: the streaming LSH-delta drain, probed the round it lands —
    # same capped classification as lsh_delta_checks (its batch twin):
    # the candidate state and the verify join's shingle arrays are the
    # pair-space working set; the drain machinery itself adds a memory
    # sink bounded by the VERIFIED pairs (tiny), not the corpus
    "stream_lsh_delta",
]

QUERIES = TABLE_QUERIES + CAPPED_QUERIES

# Second-decade cohort (sf1 -> sf10, both sides local[8] + CAPPED_CONF):
# the sublinear scale paths that fit the deliberate 1 GB harness heap
# at 100x. Two first-decade members are documented out rather than
# silently dropped:
DECADE2_QUERIES = [
    # r13 (r12 VERDICT item 5): the merged two-engine CC entry FITS
    # the capped heap at sf10 — measured 110 s Spark / 452 s oracle,
    # hash MATCH over 47,698 rows — so its tier-2 evidence and
    # decade-2 exponent are now first-class (it stays in
    # CAPPED_QUERIES for decade-1, the memory classification that
    # sets its run conditions)
    "dedup_clusters",
    "minhash_lsh",
    # r8: the 60-bit key narrowing shrank the exact-verify side's
    # per-pair shingle arrays ~8x (longs, not ~50-byte strings) —
    # the r7 OOM that kept this out of the second decade is gone
    # (~31 s at sf10 under the capped conditions)
    "minhash_estimate",
    "span_dedup",
    "bpe_token_checks",
    "epoch_shuffle",
    "user_sessions",
    "pricing_summary",
    # r8: both exact-dedup layers ride the exact_dedup_checks merge
    "exact_dedup_checks",
    "simhash_docs",
    # r7: both fit the capped heap — winnow state is row-local arrays
    # + hash-only dictionary rows; pii_scrub is a pure projection
    "winnow_fingerprint",
    "pii_scrub",
    # r9 (r8 VERDICT item 3): containment's decade-2 measurement moves
    # from prose into the artifact. The PPJoin cascade + the r9 plen
    # accounting keep the probe's hash-agg state bounded at sf10 under
    # the capped conditions (measured r9: 173.6 s, 27,827 rows); its
    # tier-2 ORACLE half is excluded with two measured deaths — the
    # unfiltered DuckDB formulation's spill exceeds the box's free
    # disk (story + what IS verified: verify_scale.EXCLUDED_TIER2).
    "containment_dedup",
]
SECOND_DECADE_NOT_RUN = {
    # minhash_estimate left this dict in r8: the 60-bit key narrowing
    # made its exact-verify side fit the capped 1 GB heap at sf10.
    "stream_sessions": (
        "the availableNow drain lands ~9.5M session rows in a MEMORY "
        "sink plus per-user state inside 1 GB at sf10 — a harness-"
        "drain artifact (production streams write to files/Kafka, "
        "never memory sinks). Its batch twin user_sessions runs the "
        "same sessionizer at both decades and is measured."
    ),
}

# Deliberately NOT probed at 10x: the exact all-pairs verifiers are
# O(N^2) BY DESIGN (the brute-force baselines the bucketed family is
# measured against); 10x data means 100x pairs (2.5G candidate pairs
# for jaccard at sf1), which no fixed harness survives and no
# production pipeline runs — the scale path IS minhash_lsh /
# neardup_pipeline / lsh_topk, which the probe covers.
QUADRATIC_BASELINES = {
    "jaccard_neardup": "exact all-pairs n-gram Jaccard: O(N^2) verify",
    "embed_cosine_neardup": "exact all-pairs cosine: O(N^2) verify",
}

# scan/Arrow/reducer sizing for the capped sessions (see
# plans/scene_volume.py's Arrow-batch story): bound scan partitions,
# Arrow batches, AND the AQE coalesce target so per-task buffers match
# the per-slot budget — compressed shuffle statistics under-estimate
# the decompressed payload working set by 3-4x, so the default 64m
# advisory target produced 130 MB-decompressed reduce tasks (heap
# death at 8 concurrent).
CAPPED_CONF = {
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.sql.files.openCostInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    # the session default (64m, session.py) is sized for production
    # executors; at the sf10 tier a broadcast build that size OOMs the
    # deliberate 1 GB harness heap ("Not enough memory to build and
    # broadcast", measured r6) — the same per-executor-memory knob a
    # real cluster turns. 8m keeps genuinely-small dims broadcast and
    # sends the rest to sort-merge, which is the correct plan at scale.
    "spark.sql.autoBroadcastJoinThreshold": "8m",
}


def _fresh_session(
    name: str, extra_conf: dict | None = None, master: str | None = None
):
    # guarded singleton reset + liveness probe shared with bench.py's
    # revival path (round-5 ADVICE: the raw private-attr resets here
    # had drifted from bench.py's hardened version)
    from sentinel_landsat_database_creation_spark.session import fresh_session

    spark = fresh_session(name, extra_conf=extra_conf, master=master)
    # warm JVM + python worker pool, as bench.py does
    spark.read.parquet(f"{SF01}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).count()
    return spark


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(SF1, "_DONE")):
        return
    os.makedirs(SF1, exist_ok=True)
    t0 = time.perf_counter()

    def copies(df, transform):
        out = None
        for k in range(COPIES):
            c = transform(df, k)
            out = c if out is None else out.unionByName(c)
        return out

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    copies(
        docs,
        lambda d, k: d.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 1_000_000)
        ).withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1z{k}")
        ),
    ).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")

    def emb_copy(d, k):
        # deterministic diagonal +-1 per (dim, copy): orthogonal, so
        # within-copy geometry is exact; cross-copy cosines scramble
        def signed(x, i):
            h = (i.cast("long") * 2654435761 + F.lit(k * 40503)) % 97
            return F.when(h % 2 == 0, x).otherwise(-x)

        px = F.transform("embedding", lambda x, i: signed(x, i))
        return d.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 10_000_000)
        ).withColumn("embedding", px)

    copies(emb, emb_copy).write.mode("overwrite").parquet(
        f"{SF1}/embeddings.parquet"
    )

    # events must land as a single FLAT file named events.parquet: the
    # streaming sources read `.option("pathGlobFilter",
    # "events.parquet").parquet(sf_dir)`, which matches file names, not
    # directories (parquet row-group splitting keeps batch reads
    # parallel despite the single file)
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    tmp_ev = f"{SF1}/_tmp_events"
    copies(
        ev,
        lambda d, k: d.withColumn(
            "user_id", F.col("user_id") + F.lit(k * 100_000_000)
        ).withColumn("event_id", F.col("event_id") + F.lit(k * 1_000_000_000)),
    ).coalesce(1).write.mode("overwrite").parquet(tmp_ev)
    import glob as _glob
    import shutil

    part = _glob.glob(f"{tmp_ev}/part-*.parquet")[0]
    shutil.move(part, f"{SF1}/events.parquet")
    shutil.rmtree(tmp_ev)

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    copies(
        li,
        lambda d, k: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000)
        ),
    ).write.mode("overwrite").parquet(f"{SF1}/lineitem.parquet")

    # tables the selected queries touch only lightly: symlink-free
    # passthrough copies so sources.testdata finds them
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{t}.parquet")

    with open(os.path.join(SF1, "_DONE"), "w") as f:
        f.write("ok")
    print(f"sf1 build: {time.perf_counter() - t0:.1f}s")


def build_sf10(spark) -> None:
    """Second decade (round-5 VERDICT item 5): scale SF1 by another 10x
    with a SECOND level of the same structure-preserving transforms —
    a fresh token suffix (cross-copy shingle overlap stays zero), a
    fresh diagonal sign pattern (within-copy geometry exact), and
    disjoint id strides one decimal order above SF1's. Only the tables
    the sublinear cohort reads are scaled (documents, embeddings,
    events, lineitem + dim passthroughs); the payload fixtures stay
    one-decade (their cost is linear-by-construction and measured at
    sf1)."""
    if os.path.exists(os.path.join(SF10, "_DONE")):
        return
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        raise RuntimeError("build_sf1 must land before build_sf10")
    os.makedirs(SF10, exist_ok=True)
    t0 = time.perf_counter()

    def copies(df, transform):
        out = None
        for k in range(COPIES):
            c = transform(df, k)
            out = c if out is None else out.unionByName(c)
        return out

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    copies(
        docs,
        lambda d, k: d.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 100_000_000)
        ).withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1y{k}")),
    ).write.mode("overwrite").parquet(f"{SF10}/documents.parquet")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")

    def emb_copy(d, k):
        def signed(x, i):
            h = (i.cast("long") * 2246822519 + F.lit(k * 68821)) % 89
            return F.when(h % 2 == 0, x).otherwise(-x)

        px = F.transform("embedding", lambda x, i: signed(x, i))
        return d.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 1_000_000_000)
        ).withColumn("embedding", px)

    copies(emb, emb_copy).write.mode("overwrite").parquet(
        f"{SF10}/embeddings.parquet"
    )

    # single flat events.parquet, as in build_sf1 (streaming globs it)
    ev = spark.read.parquet(f"{SF1}/events.parquet")
    tmp_ev = f"{SF10}/_tmp_events"
    copies(
        ev,
        lambda d, k: d.withColumn(
            "user_id", F.col("user_id") + F.lit(k * 10_000_000_000)
        ).withColumn(
            "event_id", F.col("event_id") + F.lit(k * 100_000_000_000)
        ),
    ).coalesce(1).write.mode("overwrite").parquet(tmp_ev)
    import glob as _glob
    import shutil

    part = _glob.glob(f"{tmp_ev}/part-*.parquet")[0]
    shutil.move(part, f"{SF10}/events.parquet")
    shutil.rmtree(tmp_ev)

    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    copies(
        li,
        lambda d, k: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000_000)
        ),
    ).write.mode("overwrite").parquet(f"{SF10}/lineitem.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        spark.read.parquet(f"{SF1}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF10}/{t}.parquet")

    with open(os.path.join(SF10, "_DONE"), "w") as f:
        f.write("ok")
    print(f"sf10 build: {time.perf_counter() - t0:.1f}s")


def _context_dead(spark) -> bool:
    try:
        return spark.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001
        return True


def run_set(
    spark,
    sf_dir: str,
    queries: list[str],
    session_name: str,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> tuple[dict, dict, object]:
    from sentinel_landsat_database_creation_spark.operators.dedup import (
        drain_memo_build_log,
    )
    from sentinel_landsat_database_creation_spark.plans.driver_queries import (
        REGISTRY,
    )

    timings: dict[str, float] = {}
    memo: dict[str, float] = {}
    drain_memo_build_log()
    for name in queries:
        # like bench.py: one query killing the JVM (OOM at scale IS a
        # finding worth recording) must not void every later query
        if _context_dead(spark):
            try:
                spark.stop()
            except Exception:  # noqa: BLE001 - dead gateway
                pass
            spark = _fresh_session(session_name, extra_conf, master)
            print("  [session revived]")
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            # ANY failure gets one retry in a fresh session, dead JVM
            # or not: at the capped tiers the measured failure mode is
            # accumulated session state (memo blocks, arrow arenas)
            # squeezing the deliberate 1 GB heap — a query-level OOM
            # with a surviving context is the same confounder as a
            # JVM death (r7: winnow@sf10 failed mid-probe, passed
            # 33.6 s in a fresh session). A repeat failure in the
            # clean session records None honestly.
            try:
                err = f"{type(exc).__name__}: {exc}"[:300]
            except Exception:  # noqa: BLE001 — __str__ needs the gateway
                err = type(exc).__name__
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = _fresh_session(session_name, extra_conf, master)
            print(f"  [{name} failed ({err}); retrying in fresh session]")
            drain_memo_build_log()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc2:  # noqa: BLE001
                try:
                    err = f"{type(exc2).__name__}: {exc2}"[:300]
                except Exception:  # noqa: BLE001
                    err = type(exc2).__name__
                timings[name] = None
                print(f"  {name}@{sf_dir}: FAILED {err}")
                drain_memo_build_log()
                continue
        sample = time.perf_counter() - t0
        for label, secs in drain_memo_build_log():
            memo[label] = memo.get(label, 0.0) + secs
            sample -= secs
        timings[name] = round(max(sample, 0.0), 3)
        print(f"  {name}@{sf_dir}: {timings[name]}s")
    return timings, {k: round(v, 3) for k, v in memo.items()}, spark


def main() -> None:
    spark = _fresh_session("scale-build")
    build_sf1(spark)
    build_sf10(spark)
    spark.stop()

    t01: dict = {}
    t1: dict = {}
    t10: dict = {}
    m01: dict = {}
    m1: dict = {}
    m10: dict = {}

    # Disk-backed memo blocks for BOTH scale factors (same conditions
    # on both sides of the exponent): the default on-heap
    # materialization of the 10x shingle table killed the 1 GB JVM —
    # see operators/dedup.py:_memo_storage_level for the 100 TB rule
    # this expresses.
    import os as _os

    _os.environ["SPARK_GRAFT_MEMO_STORAGE"] = "DISK_ONLY"

    print("run table queries @ sf0.1 (local[32]) ...")
    spark = _fresh_session("scale-sf01")
    a, b, spark = run_set(spark, SF01, TABLE_QUERIES, "scale-sf01")
    t01.update(a)
    m01.update(b)
    spark.stop()

    print("run table queries @ sf1 (local[32]) ...")
    spark = _fresh_session("scale-sf1")
    a, b, spark = run_set(spark, SF1, TABLE_QUERIES, "scale-sf1")
    t1.update(a)
    m1.update(b)
    spark.stop()

    # Second decade under the CAPPED conditions on BOTH sides: at sf10
    # the shingle/session working sets exceed the deliberate 1 GB heap
    # at 32 concurrent slots (measured: java.lang.OutOfMemoryError in
    # the memo builds) — the same memory:core ratio the payload cohort
    # hit at sf1. local[8] + the payload-sized scan/AQE conf is the
    # local-mode expression of sizing executor memory per core; running
    # sf1 under the same conditions keeps the exponent an
    # identical-conditions comparison.
    print("second decade: table queries @ sf1 (local[8] capped) ...")
    spark = _fresh_session("scale2-sf1", CAPPED_CONF, "local[8]")
    a, b, spark = run_set(
        spark, SF1, DECADE2_QUERIES, "scale2-sf1", CAPPED_CONF, "local[8]"
    )
    t1c: dict = dict(a)
    m1c: dict = dict(b)
    spark.stop()

    print("second decade: table queries @ sf10 (local[8] capped) ...")
    spark = _fresh_session("scale-sf10", CAPPED_CONF, "local[8]")
    a, b, spark = run_set(
        spark, SF10, DECADE2_QUERIES, "scale-sf10", CAPPED_CONF, "local[8]"
    )
    t10.update(a)
    m10.update(b)
    spark.stop()

    print("run capped queries @ sf0.1 (local[8]) ...")
    spark = _fresh_session("scale-p01", CAPPED_CONF, "local[8]")
    a, b, spark = run_set(
        spark, SF01, CAPPED_QUERIES, "scale-p01", CAPPED_CONF, "local[8]"
    )
    t01.update(a)
    m01.update(b)
    spark.stop()

    print("run capped queries @ sf1 (local[8]) ...")
    spark = _fresh_session("scale-p1", CAPPED_CONF, "local[8]")
    a, b, spark = run_set(
        spark, SF1, CAPPED_QUERIES, "scale-p1", CAPPED_CONF, "local[8]"
    )
    t1.update(a)
    m1.update(b)
    spark.stop()

    import math

    def expo(lo: dict, hi: dict, name: str):
        a, b = lo.get(name), hi.get(name)
        return round(math.log10(b / a), 3) if a and b and a > 0 else None

    exponents = {name: expo(t01, t1, name) for name in QUERIES}
    # second decade (round-5 VERDICT item 5): sf1 -> sf10 for the
    # sublinear cohort, confirming the first decade's exponents aren't
    # flattered by fixed-overhead amortization at small sf; both sides
    # measured under the capped local[8] conditions (see above)
    exponents2 = {name: expo(t1c, t10, name) for name in DECADE2_QUERIES}
    payload = {
        "metric": "scaleup_decade",
        "copies": COPIES,
        "capped_queries": CAPPED_QUERIES,
        "capped_master": "local[8]",
        "capped_conf": CAPPED_CONF,
        "quadratic_baselines_excluded": QUADRATIC_BASELINES,
        "second_decade_queries": DECADE2_QUERIES,
        "second_decade_master": "local[8] + capped_conf (both sides)",
        "second_decade_not_run": SECOND_DECADE_NOT_RUN,
        "memo_storage": "DISK_ONLY",
        "sf01": t01,
        "sf1": t1,
        "sf1_capped": t1c,
        "sf10": t10,
        "memo_sf01": m01,
        "memo_sf1": m1,
        "memo_sf1_capped": m1c,
        "memo_sf10": m10,
        "exponent": exponents,
        "exponent_decade2": exponents2,
    }
    out = Path(__file__).resolve().parents[1] / "BENCH_SCALE.json"
    out.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
