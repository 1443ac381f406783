"""Unit tests for the bench attribution stream (round-5 VERDICT item
3): _timed_build must log each memo build's OWN wall seconds — nested
builds (RLock re-entry, e.g. the verified-pair table's builder calling
shingle_rows_materialized) subtract their inner spans so the logged
lines sum to real elapsed time without double counting. Pure Python —
no Spark session."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sentinel_landsat_database_creation_spark.operators import dedup


class _FakeDF:
    def localCheckpoint(self, eager=True, storageLevel=None):
        return self


def _sleep_build(secs, inner=None):
    def build():
        time.sleep(secs)
        if inner is not None:
            inner()
        return _FakeDF()

    return build


def test_flat_build_logs_own_time():
    dedup.drain_memo_build_log()
    t0 = time.perf_counter()
    dedup._timed_build(("flat",), _sleep_build(0.05))
    elapsed = time.perf_counter() - t0
    log = dedup.drain_memo_build_log()
    assert [label for label, _ in log] == ["memo:flat"]
    assert 0.04 <= log[0][1] <= elapsed + 0.01


def test_nested_build_subtracts_inner_span():
    dedup.drain_memo_build_log()

    def inner():
        dedup._timed_build(("inner",), _sleep_build(0.08))

    t0 = time.perf_counter()
    dedup._timed_build(("outer",), _sleep_build(0.05, inner=inner))
    elapsed = time.perf_counter() - t0
    log = dict(dedup.drain_memo_build_log())
    assert set(log) == {"memo:inner", "memo:outer"}
    # inner charged at least its own sleep; outer charged only ITS
    # span — the inner build's full wall time is subtracted, so the
    # two lines sum to the real elapsed total (load-robust bounds:
    # compare against measured elapsed, not absolute constants)
    assert log["memo:inner"] >= 0.07
    assert log["memo:outer"] <= elapsed - log["memo:inner"] + 0.01, (
        "outer must exclude the nested build's span"
    )
    assert abs((log["memo:inner"] + log["memo:outer"]) - elapsed) <= 0.02, (
        "lines must sum to the real elapsed total"
    )


def test_failed_build_logs_nothing_and_unwinds_stack():
    dedup.drain_memo_build_log()

    def boom():
        raise RuntimeError("build failed")

    try:
        dedup._timed_build(("bad",), boom)
    except RuntimeError:
        pass
    assert dedup.drain_memo_build_log() == []
    # the thread-local stack unwound: a following build logs normally
    dedup._timed_build(("after",), _sleep_build(0.01))
    log = dedup.drain_memo_build_log()
    assert [label for label, _ in log] == ["memo:after"]


def test_setup_time_shares_the_stream():
    dedup.drain_memo_build_log()
    dedup.log_setup_time("setup:fixture", 1.25)
    assert dedup.drain_memo_build_log() == [("setup:fixture", 1.25)]
    assert dedup.drain_memo_build_log() == []  # drained
