"""BENCH_LAST_GOOD.json regime guard (bench._maybe_save_last_good).

The last-good record is the stall-watchdog's fallback evidence of the chip's
clear-window throughput (PERF.md "Measurement regimes"); a run completing
inside the reproducible degraded tunnel regime (~15x below clear) must not
replace it. Pure host-side JSON logic — no device work.
"""

import json
import os

import bench


def _run(tmp_path, monkeypatch, seq):
    path = tmp_path / "last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(path))
    finals = []
    for value in seq:
        final = {"metric": "m", "value": value}
        bench._maybe_save_last_good(final)
        finals.append(final)
    rec = json.loads(path.read_text()) if path.exists() else None
    return rec, finals


def test_first_complete_run_saves(tmp_path, monkeypatch):
    rec, finals = _run(tmp_path, monkeypatch, [172000.0])
    assert rec["value"] == 172000.0
    assert "measured_at_utc" in rec
    assert "last_good_not_replaced" not in finals[0]


def test_degraded_run_keeps_record_and_annotates(tmp_path, monkeypatch):
    rec, finals = _run(tmp_path, monkeypatch, [172000.0, 11200.0])
    assert rec["value"] == 172000.0  # degraded run did not replace
    note = finals[1]["last_good_not_replaced"]
    assert "degraded" in note and "172000" in note


def test_normal_spread_run_replaces(tmp_path, monkeypatch):
    # within the ~±10% clear-window spread (well above the 50% threshold)
    rec, finals = _run(tmp_path, monkeypatch, [172000.0, 160000.0])
    assert rec["value"] == 160000.0
    assert "last_good_not_replaced" not in finals[1]


def test_recovery_after_degraded_window(tmp_path, monkeypatch):
    rec, _ = _run(tmp_path, monkeypatch, [172000.0, 11200.0, 168000.0])
    assert rec["value"] == 168000.0  # clear-window run resumes updating
