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
    they must be reset before getOrCreate can launch a fresh JVM."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        SparkSession.getActiveSession().stop()
    except Exception:  # noqa: BLE001
        pass
    with SparkContext._lock:
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None
    spark = get_spark(app_name="bench")
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

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    failed_timings: dict[str, float] = {}
    restarts = 0
    for name, (fn, _) in REGISTRY.items():
        # One query killing the JVM (e.g. an OOM under accumulated
        # session state) must not cascade into failures for every query
        # after it: detect a dead SparkContext and rebuild the session
        # before each query. The restart count is surfaced in the JSON
        # so a "passing" bench can't silently hide crash-looping.
        if _context_dead(spark):
            spark = _revive_session()
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
            samples.append(time.perf_counter() - t0)
        if samples:
            timings[name] = round(sorted(samples)[len(samples) // 2], 4)

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
                "n": len(timings),
                "n_failed": len(errors),
                "restarts": restarts,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
