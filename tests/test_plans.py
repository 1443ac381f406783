"""Physical-plan shape assertions — the 100 TB stance, checked in CI.

These pin the properties that matter at scale: predicate pushdown into
the parquet scan, column pruning, broadcast joins for small dimensions
(no shuffle of the big side), and no Python eval in hot paths.
"""

from __future__ import annotations

from sentinel_landsat_database_creation_spark.plans.driver_queries import REGISTRY

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: untouched wide columns never reach the scan
    assert "l_comment" not in plan
    assert "HashAggregate" in plan


def test_top_orders_broadcasts_customer(spark):
    plan = _plan(spark, "top_orders")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan  # top-k without global sort


def test_nation_revenue_all_dims_broadcast(spark):
    plan = _plan(spark, "nation_revenue")
    # customer/nation/region all broadcast: lineitem never shuffles for
    # the joins themselves
    assert plan.count("BroadcastHashJoin") >= 3


def test_pairing_keys_broadcast(spark):
    plan = _plan(spark, "pairing_keys")
    assert "BroadcastHashJoin" in plan


def test_catalog_event_labels_no_python_eval(spark):
    plan = _plan(spark, "catalog_event_labels")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # tiny week-label table broadcast


def test_embed_quality_stays_native(spark):
    plan = _plan(spark, "embed_quality")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_stats_stays_native(spark):
    plan = _plan(spark, "token_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
