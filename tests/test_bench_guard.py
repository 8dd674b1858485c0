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


def _run_full(tmp_path, monkeypatch, seq):
    """seq: list of final dicts (value + optional link rows)."""
    path = tmp_path / "last_good.json"
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(path))
    finals = []
    for final in seq:
        final = dict(final)
        bench._maybe_save_last_good(final)
        finals.append(final)
    rec = json.loads(path.read_text()) if path.exists() else None
    return rec, finals


def _clear_run(v=170000.0, link=66.8):
    return {
        "metric": "m", "value": v, "tunnel_h2d_mbps": link,
        "streamed_fp16_e2e_fps": round(link * 1e6 / 8192, 1),
        "streamed_vs_baseline": 1.8, "streamed_int8_fps": 10000.0,
        "streamed_int4_fps_lossy": 17000.0,
        "link_ceiling_fps_fp16": round(link * 1e6 / 8192, 1),
    }


def test_degraded_link_keeps_only_link_rows(tmp_path, monkeypatch):
    """Round-3 failure mode: clear compute + degraded link must update the
    compute rows but keep the record's clear-window streamed rows."""
    clear = _clear_run()
    degraded = {**_clear_run(v=165000.0, link=46.3)}
    rec, finals = _run_full(tmp_path, monkeypatch, [clear, degraded])
    assert rec["value"] == 165000.0  # compute rows updated
    assert rec["tunnel_h2d_mbps"] == 66.8  # link rows kept
    assert rec["streamed_fp16_e2e_fps"] == clear["streamed_fp16_e2e_fps"]
    assert rec["streamed_int8_fps"] == 10000.0
    assert "link_rows_from" in rec
    assert "last_good_link_rows_kept" in finals[1]


def test_link_within_spread_replaces_link_rows(tmp_path, monkeypatch):
    clear = _clear_run()
    nextrun = _clear_run(v=168000.0, link=62.0)
    rec, finals = _run_full(tmp_path, monkeypatch, [clear, nextrun])
    assert rec["tunnel_h2d_mbps"] == 62.0
    assert "last_good_link_rows_kept" not in finals[1]


def test_link_horizon_accepts_sustained_regression(tmp_path, monkeypatch):
    """After _STALE_HORIZON consecutive out-of-spread link runs, the new
    link-bound rows are accepted (a real sustained change, ADVICE r3)."""
    seq = [_clear_run()] + [
        _clear_run(v=165000.0, link=40.0) for _ in range(bench._STALE_HORIZON + 1)
    ]
    rec, finals = _run_full(tmp_path, monkeypatch, seq)
    assert rec["tunnel_h2d_mbps"] == 40.0
    assert "last_good_link_horizon_expired" in finals[-1]


def test_link_anchor_does_not_ratchet_down(tmp_path, monkeypatch):
    """Round-4 failure mode: the spread anchor must be the HIGH-WATER link
    rate, not the last-saved rate. A mildly-degraded run inside spread
    (62.0 of 66.8) legitimately updates the link rows — but a following
    43.0 run must be judged against the 66.8 high-water mark (out of
    spread -> rows kept), not against 62.0-then-50-then-43 stepping stones
    (the observed 66.8 -> 46.3 -> 42.6 ratchet across rounds 3-4)."""
    seq = [_clear_run(), _clear_run(v=168000.0, link=62.0),
           _clear_run(v=166000.0, link=51.0),
           _clear_run(v=165000.0, link=43.0)]
    rec, finals = _run_full(tmp_path, monkeypatch, seq)
    assert rec["tunnel_h2d_mbps_best"] == 66.8  # high-water survives updates
    # 51.0 passes vs best 66.8 (>= 75%); 43.0 does not
    assert "last_good_link_rows_kept" not in finals[2]
    assert "last_good_link_rows_kept" in finals[3]
    assert rec["tunnel_h2d_mbps"] == 51.0  # rows frozen at the last in-spread run
    assert rec["value"] == 165000.0  # compute rows still updated


def test_link_high_water_rises_with_a_better_window(tmp_path, monkeypatch):
    rec, _ = _run_full(tmp_path, monkeypatch,
                       [_clear_run(link=55.0), _clear_run(link=70.0)])
    assert rec["tunnel_h2d_mbps_best"] == 70.0


def test_link_horizon_resets_high_water(tmp_path, monkeypatch):
    """Accepting a sustained link regression must also reset the high-water
    anchor, or every post-regression run re-trips the guard forever."""
    seq = [_clear_run()] + [
        _clear_run(v=165000.0, link=40.0)
        for _ in range(bench._STALE_HORIZON + 1)
    ] + [_clear_run(v=166000.0, link=41.0)]
    rec, finals = _run_full(tmp_path, monkeypatch, seq)
    assert rec["tunnel_h2d_mbps_best"] == 41.0
    assert "last_good_link_rows_kept" not in finals[-1]
    assert rec["tunnel_h2d_mbps"] == 41.0


def test_compute_horizon_accepts_sustained_regression(tmp_path, monkeypatch):
    seq = [170000.0] + [30000.0] * (bench._STALE_HORIZON + 1)
    rec, finals = _run_full(
        tmp_path, monkeypatch, [{"metric": "m", "value": v} for v in seq]
    )
    assert rec["value"] == 30000.0
    assert "last_good_horizon_expired" in finals[-1]
    # and a later clear run resets the counter + resumes updating
    rec, _ = _run_full(tmp_path, monkeypatch, [{"metric": "m", "value": 171000.0}])
    assert rec["value"] == 171000.0
    assert rec["degraded_runs_since_save"] == 0


def test_mid_run_link_recovery_still_guards(tmp_path, monkeypatch):
    """2026-08-20 failure mode: the streamed reps ran inside a stalled
    window (pre-flight bracket 0.0 MB/s) but the tunnel recovered before the
    trailing link measurement (50.7, inside spread of best 66.8) — judging
    by the trailing rate alone overwrote the record's clear-window streamed
    rows. The guard must judge by the WORST rate bracketing the streamed
    reps (streamed_rows_h2d_mbps)."""
    clear = _clear_run()
    recovered = {**_clear_run(v=178000.0, link=50.7),
                 "streamed_rows_h2d_mbps": [0.0, 50.7]}
    rec, finals = _run_full(tmp_path, monkeypatch, [clear, recovered])
    assert rec["value"] == 178000.0  # compute rows updated
    assert rec["tunnel_h2d_mbps"] == 66.8  # link rows kept
    assert rec["streamed_fp16_e2e_fps"] == clear["streamed_fp16_e2e_fps"]
    assert "last_good_link_rows_kept" in finals[1]


def test_fully_stalled_zero_link_guards(tmp_path, monkeypatch):
    """A fully-stalled probe legitimately measures 0.0 MB/s — falsy, so the
    old `if new_link and ...` skipped the guard entirely and saved the
    stalled-window rows."""
    clear = _clear_run()
    stalled = _clear_run(v=169000.0, link=0.0)
    rec, finals = _run_full(tmp_path, monkeypatch, [clear, stalled])
    assert rec["tunnel_h2d_mbps"] == 66.8  # link rows kept
    assert "last_good_link_rows_kept" in finals[1]


def test_force_env_overwrites_unconditionally(tmp_path, monkeypatch):
    clear = _clear_run()
    degraded = {"metric": "m", "value": 9000.0, "tunnel_h2d_mbps": 20.0}
    monkeypatch.setenv("EXOGROUND_BENCH_FORCE_LAST_GOOD", "1")
    rec, finals = _run_full(tmp_path, monkeypatch, [clear, degraded])
    assert rec["value"] == 9000.0
    assert rec["tunnel_h2d_mbps"] == 20.0
    assert "last_good_not_replaced" not in finals[1]
