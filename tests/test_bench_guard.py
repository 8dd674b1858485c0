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


# ---------------------------------------------------------------------------
# round-5 kill-safety (VERDICT r4 item 1): the driver-visible JSON must be
# un-losable — provisional early emit, SIGTERM partial dump, one total budget
# ---------------------------------------------------------------------------

import signal
import subprocess
import sys
import textwrap
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_provisional_line_attaches_last_good(tmp_path, monkeypatch, capsys):
    path = tmp_path / "last_good.json"
    path.write_text(json.dumps({"value": 172000.0, "measured_at_utc": "x"}))
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(path))
    bench._emit_provisional()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0  # historical numbers never presented as current
    assert "provisional" in rec
    assert rec["last_good_run"]["value"] == 172000.0
    assert rec["metric"] == "htm_align_overlap_seq_throughput"


def test_provisional_line_without_record(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(tmp_path / "none.json"))
    bench._emit_provisional()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0 and "last_good_run" not in rec


def test_sigterm_mid_bench_emits_partial_json(tmp_path):
    """kill -TERM mid-bench (what an external `timeout` sends) must yield a
    complete JSON line carrying everything measured so far — the round-4
    driver capture died rc=124 holding a full set of rows it never printed."""
    last_good = tmp_path / "last_good.json"
    last_good.write_text(json.dumps({"value": 180300.0, "measured_at_utc": "t"}))
    code = textwrap.dedent(
        """
        import sys, time
        sys.path.insert(0, {repo!r})
        import bench
        bench._LAST_GOOD_PATH = {lg!r}
        bench._emit_provisional()
        partial = {{"train_cotrain_step_ms": 6.26}}

        class _WD:
            stage = "inference: streamed fp16 reps"

        bench._install_kill_handlers(partial, _WD())
        print("READY", flush=True)
        time.sleep(60)
        """
    ).format(repo=_REPO, lg=str(last_good))
    p = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    try:
        lines = []
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            line = p.stdout.readline()
            lines.append(line)
            if line.strip() == "READY":
                break
        assert lines and lines[-1].strip() == "READY", lines
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=30)
    finally:
        if p.poll() is None:
            p.kill()
    final = json.loads(out.strip().splitlines()[-1])
    # the partial's measured fields survive, the stage is named, and the
    # last-good record rides along (headline never landed in this run)
    assert final["train_cotrain_step_ms"] == 6.26
    assert "signal" in final["error"] and "streamed fp16 reps" in final["error"]
    assert final["value"] == 0
    assert final["last_good_run"]["value"] == 180300.0
    # the FIRST line (consumed by the readline loop above) was the
    # provisional record: parseable on its own
    first = json.loads([ln for ln in lines if ln.strip()][0])
    assert "provisional" in first


def test_budget_clamp_and_remaining(monkeypatch):
    monkeypatch.setenv("EXOGROUND_BENCH_TOTAL_S", "100")
    b = bench._Budget()
    assert b.total_s == 100.0
    assert 95 < b.remaining() <= 100
    assert b.clamp(900.0, 0.4) <= 40.0
    assert b.clamp(5.0) == 5.0


def test_stage_fits_annotates_and_skips():
    b = bench._Budget(total_s=10.0)
    partial = {}
    assert not bench._stage_fits(partial, b, "train_bs64", 200.0)
    assert "train_bs64_skipped" in partial
    assert bench._stage_fits(partial, b, "tiny", 1.0)


def test_rows_measured_at_provenance(tmp_path, monkeypatch):
    """VERDICT r4 weak #4: a mixed-provenance record must state, per row
    group, when its rows were measured — carried link rows keep their
    original stamp while headline/train stamps are fresh."""
    clear = _clear_run()
    degraded = _clear_run(v=165000.0, link=40.0)
    rec, _ = _run_full(tmp_path, monkeypatch, [clear, degraded])
    rows = rec["rows_measured_at"]
    assert rows["link"] == rec["link_rows_from"]  # carried group: old stamp
    assert rows["headline"] == rec["measured_at_utc"]  # fresh groups
    assert rows["train"] == rec["measured_at_utc"]


def test_train_rows_carry_when_budget_skipped(tmp_path, monkeypatch):
    """A budget-limited run that skipped the train stages must not erase the
    record's train rows; the carried group keeps its own provenance stamp."""
    full = {**_clear_run(), "train_cotrain_samples_per_sec_per_chip": 2557.0,
            "train_cotrain_step_ms": 6.26}
    no_train = _clear_run(v=171000.0)
    rec, _ = _run_full(tmp_path, monkeypatch, [full, no_train])
    assert rec["train_cotrain_samples_per_sec_per_chip"] == 2557.0
    assert rec["train_cotrain_step_ms"] == 6.26
    assert rec["value"] == 171000.0  # headline still updated
    # the train stamp traces to the ORIGINAL measurement's record (equal
    # wall-clock seconds here, but sourced from prev, not this run)
    assert rec["rows_measured_at"]["train"] is not None


def test_link_anchor_not_raised_by_probe_burst(tmp_path, monkeypatch):
    """ADVICE r4: an in-spread run whose short pre-flight probe bursts high
    (streamed_rows_h2d_mbps [90, 55]) must raise the high-water anchor only
    from the trailing FULL measurement (55), not the probe (90) — an
    inflated anchor flags later legitimate clear windows as degraded."""
    seq = [_clear_run(link=55.0),
           {**_clear_run(v=169000.0, link=55.0),
            "streamed_rows_h2d_mbps": [90.0, 55.0]},
           _clear_run(v=168000.0, link=56.0)]
    rec, finals = _run_full(tmp_path, monkeypatch, seq)
    assert rec["tunnel_h2d_mbps_best"] == 56.0  # 90.0 probe never anchored
    assert "last_good_link_rows_kept" not in finals[2]


def test_dead_link_skipped_rows_never_expire_horizon(tmp_path, monkeypatch):
    """A dead-link run skips the streamed/serve measurements entirely — it
    must keep the record's link rows WITHOUT advancing the staleness
    horizon (review finding: 5 consecutive skipped runs used to expire the
    horizon and permanently strip every _LINK_BOUND_KEYS row while
    collapsing the anchor to ~0)."""
    clear = _clear_run()
    dead = {"metric": "m", "value": 169000.0, "tunnel_h2d_mbps": 0.0}
    seq = [clear] + [dict(dead) for _ in range(bench._STALE_HORIZON + 3)]
    rec, finals = _run_full(tmp_path, monkeypatch, seq)
    assert rec["streamed_fp16_e2e_fps"] == clear["streamed_fp16_e2e_fps"]
    assert rec["tunnel_h2d_mbps_best"] == 66.8  # anchor never collapsed
    assert rec["degraded_link_runs_since_save"] == 0  # horizon untouched
    assert "last_good_link_horizon_expired" not in finals[-1]
    assert "dead link" in finals[-1]["last_good_link_rows_kept"]
    assert rec["value"] == 169000.0  # compute rows still update
