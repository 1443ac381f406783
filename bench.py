#!/usr/bin/env python
"""Benchmark harness: runs the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Execution is timed with the noop sink so measurements cover the full
Spark plan (scan -> shuffle -> sink) without driver-side collect costs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sentinel_landsat_database_creation_spark.plans.driver_queries import (  # noqa: E402
    REGISTRY,
)
from sentinel_landsat_database_creation_spark.session import get_spark  # noqa: E402


def _context_dead(spark) -> bool:
    try:
        return spark.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 — a dead py4j gateway IS "dead"
        return True


def _revive_session():
    """Rebuild the session even when the backing JVM died (OOM-killed
    gateway): pyspark caches the gateway/context in module globals, so
    they must be reset before getOrCreate can launch a fresh JVM.

    The resets touch pyspark PRIVATE attributes (not stable API), so
    every one is hasattr-guarded and the whole revival is verified with
    a liveness probe at the end: a pyspark upgrade that breaks revival
    raises here — visible to the caller, which stops the run instead of
    letting a dead session cascade errors across every later query
    (round-4 ADVICE)."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        SparkSession.getActiveSession().stop()
    except Exception:  # noqa: BLE001
        pass
    missing = [
        a
        for a in ("_lock", "_active_spark_context", "_gateway", "_jvm")
        if not hasattr(SparkContext, a)
    ] + [
        a
        for a in ("_instantiatedSession", "_activeSession")
        if not hasattr(SparkSession, a)
    ]
    if missing:
        print(
            f"bench: pyspark internals moved ({missing}); revival degraded",
            file=sys.stderr,
        )
    else:
        with SparkContext._lock:
            SparkContext._active_spark_context = None
            SparkContext._gateway = None
            SparkContext._jvm = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
    spark = get_spark(app_name="bench")
    if _context_dead(spark):
        raise RuntimeError(
            "session revival failed (pyspark internals changed?); "
            "falling back to hard stop so the failure is visible"
        )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once on the smallest table, and the Python
    # worker pool once with a no-op mapInPandas, so per-query times
    # measure the plan — not first-job startup or first-worker spawn
    # (which otherwise lands on an arbitrary pandas-UDF query).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).count()

    # Median-of-N per query beats the ±30% host noise documented in the
    # README; default 1 rep keeps the driver's per-round run cheap.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))

    from sentinel_landsat_database_creation_spark.operators.dedup import (
        drain_memo_build_log,
    )

    timings: dict[str, float] = {}
    memo_timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    failed_timings: dict[str, float] = {}
    restarts = 0
    drain_memo_build_log()  # discard warm-up noise
    for name, (fn, _) in REGISTRY.items():
        # One query killing the JVM (e.g. an OOM under accumulated
        # session state) must not cascade into failures for every query
        # after it: detect a dead SparkContext and rebuild the session
        # before each query. The restart count is surfaced in the JSON
        # so a "passing" bench can't silently hide crash-looping.
        if _context_dead(spark):
            try:
                spark = _revive_session()
            except Exception as exc:  # noqa: BLE001 — revival itself broke:
                # surface it once and stop instead of erroring every
                # remaining query against a dead gateway.
                errors["__session__"] = f"{type(exc).__name__}: {exc}"[:200]
                break
            restarts += 1
        samples: list[float] = []
        for _rep in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — one bad query must not
                # void the whole round's benchmark record; the failure is
                # surfaced in the JSON (and the correctness gate catches the
                # wrong-answer case independently).
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                # A failed query's partial elapsed time (possibly a drain
                # timeout) must not pollute the headline total.
                failed_timings[name] = round(time.perf_counter() - t0, 4)
                break
            sample = time.perf_counter() - t0
            # Attribution robustness (round-5 VERDICT): shared one-time
            # builds (memoized checkpoint tables, fixture writes) are
            # charged to their own "memo:<tag>" bench lines and
            # subtracted from whichever query happened to trigger them,
            # so per-query numbers are warm-state plan costs that don't
            # swing with registry order. The headline total still
            # includes the memo lines — wall time is conserved.
            for label, secs in drain_memo_build_log():
                memo_timings[label] = memo_timings.get(label, 0.0) + secs
                sample -= secs
            samples.append(max(sample, 0.0))
        if samples:
            timings[name] = round(sorted(samples)[len(samples) // 2], 4)

    memo_timings = {k: round(v, 4) for k, v in memo_timings.items()}
    timings.update(memo_timings)
    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "registry_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    if reps > 1:
        payload["reps"] = reps
    if restarts:
        payload["session_restarts"] = restarts
    if errors:
        payload["errors"] = errors
        payload["failed_timings"] = failed_timings
    print(json.dumps(payload))
    # The driver captures only the tail of stdout; at 82+ queries the full
    # line above can be cut mid-stream ("parsed": null in BENCH_r03). Emit a
    # compact summary line LAST so the tail always ends with parseable JSON.
    print(
        json.dumps(
            {
                "metric": "registry_total",
                "value": total,
                "n": len(timings) - len(memo_timings),
                "n_failed": len(errors),
                "restarts": restarts,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
