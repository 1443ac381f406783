"""bench.py's self-maintained regression gate (round-5 VERDICT item 6):
BENCH_PREV.json records warm per-query numbers per sf; the next run
flags >30% slowdowns with a visible absolute move. No Spark needed —
pure comparator mechanics."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parents[1] / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _with_baseline(monkeypatch, tmp_path, book):
    p = tmp_path / "BENCH_PREV.json"
    if book is not None:
        p.write_text(json.dumps(book))
    monkeypatch.setattr(bench, "_BASELINE_PATH", p)
    return p


def test_no_baseline_yields_none(monkeypatch, tmp_path):
    _with_baseline(monkeypatch, tmp_path, None)
    assert bench._regressions_vs_prior({"q1": 5.0}, 0.1) is None


def test_wrong_sf_yields_none(monkeypatch, tmp_path):
    _with_baseline(monkeypatch, tmp_path, {"0.01": {"queries": {"q1": 1.0}}})
    assert bench._regressions_vs_prior({"q1": 5.0}, 0.1) is None


def test_flags_only_real_drift(monkeypatch, tmp_path):
    prev = {
        "big_slow": 2.0,  # -> 3.0: +50% and +1.0s  => flagged
        "ratio_only": 0.1,  # -> 0.2: +100% but +0.1s => jitter, skipped
        "abs_only": 10.0,  # -> 10.5: +0.5s but +5%  => inside band
        "faster": 4.0,  # -> 2.0: improvement      => never flagged
        "memo:build": 1.0,  # memo lines skipped entirely
    }
    now = {
        "big_slow": 3.0,
        "ratio_only": 0.2,
        "abs_only": 10.5,
        "faster": 2.0,
        "memo:build": 9.0,
        "brand_new": 7.0,  # no prior number: skipped
    }
    _with_baseline(monkeypatch, tmp_path, {"0.1": {"queries": prev}})
    out = bench._regressions_vs_prior(now, 0.1)
    assert list(out["flagged"]) == ["big_slow"]
    assert out["flagged"]["big_slow"]["ratio"] == 1.5


def test_record_baseline_is_per_sf(monkeypatch, tmp_path):
    p = _with_baseline(monkeypatch, tmp_path, {"0.1": {"queries": {"a": 1.0}}})
    bench._record_baseline({"b": 2.0}, 0.01)
    book = json.loads(p.read_text())
    assert book["0.1"]["queries"] == {"a": 1.0}  # other sf untouched
    assert book["0.01"]["queries"] == {"b": 2.0}
