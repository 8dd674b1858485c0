"""Scenario-stratified analysis of grounding test results (scripted
equivalent of the reference's analysis notebook
visualization/scenario_stratification_results.ipynb).

Consumes the trainer's ``test_results_epoch_N.json`` dumps
(EgoExoTrainer.evaluate: per-batch {'loss_dict': (B, N) IoU map,
'metadata': {narration, video_id, cam_id, narr_ranks}}) and reproduces the
notebook's analyses as a CLI:

  * per-take flattening of (iou, narration, take, cam) records
  * take -> (task_name, parent_task_name) mapping from an EgoExo4D-style
    takes.json (notebook cell 3/6)
  * recall@IoU>=theta overall and per task / parent task (compute_recall_at_k)
  * per-group IoU mean/std/count tables (groupby('task_name'), cell 9)
  * seen/unseen physical-environment split given a held-out take list
    (the notebook's test_unique list is passed as a file, one take per line)
  * multi-model comparison: each input json becomes one column/bar group
  * outputs: stratified tables as json/csv + optional grouped-bar chart PNG

Usage:
  python -m exoground_tpu.tools.stratify_results RESULTS.json [MORE.json ...]
      [--takes takes.json] [--unseen unseen_takes.txt]
      [--group task|parent_task|take] [--out-dir DIR] [--plot]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_THRESHOLDS = (0.1, 0.3, 0.5, 0.7)


def flatten_results(results: List[Dict]) -> List[Dict]:
    """One record per narration: {'iou', 'narration', 'take', 'cam'}.

    Mirrors the notebook's process_data: metadata lists are per batch row;
    loss_dict rows align with the narration lists (padded IoU entries beyond
    each row's narration count are dropped).
    """
    records = []
    for res in results:
        meta = res.get("metadata") or {}
        ious = res.get("loss_dict") or []
        narrs = meta.get("narration") or []
        vids = meta.get("video_id") or []
        cams = meta.get("cam_id") or []
        iou_arr = np.asarray(ious, dtype=np.float64)
        if iou_arr.ndim == 1:  # a single row's flat list
            iou_arr = iou_arr[None]
        for i, n_list in enumerate(narrs):
            if n_list is None:
                continue
            row = iou_arr[i] if i < len(iou_arr) else np.asarray([])
            take = vids[i] if i < len(vids) else None
            cam = cams[i] if i < len(cams) else None
            for j, narration in enumerate(n_list):
                if j >= row.shape[0]:
                    break
                records.append({
                    "iou": float(row[j]),
                    "narration": narration,
                    "take": take,
                    "cam": cam,
                })
    return records


def load_take_task_map(takes_json_path: str) -> Dict[str, Dict[str, str]]:
    """take_name -> {'task_name', 'parent_task_name'} (notebook cell 6)."""
    with open(takes_json_path) as f:
        takes = json.load(f)
    return {
        t["take_name"]: {
            "task_name": t.get("task_name", "unknown"),
            "parent_task_name": t.get("parent_task_name", "unknown"),
        }
        for t in takes
    }


def recall_at_thresholds(
    ious: Sequence[float], thresholds: Sequence[float] = DEFAULT_THRESHOLDS
) -> Dict[str, float]:
    """Fraction of narrations with IoU >= theta (notebook compute_recall_at_k;
    identical to the trainer's IoU>=theta meters)."""
    arr = np.asarray(list(ious), dtype=np.float64)
    if arr.size == 0:
        return {f"IoU>={t}": float("nan") for t in thresholds}
    return {f"IoU>={t}": float((arr >= t).mean()) for t in thresholds}


def _group_key(rec: Dict, group: str, take_map: Optional[Dict]) -> str:
    if group == "take":
        return str(rec["take"])
    info = (take_map or {}).get(rec["take"]) if rec["take"] else None
    if info is None:
        return "unknown"
    return info["task_name" if group == "task" else "parent_task_name"]


def stratify(
    records: List[Dict],
    group: str = "task",
    take_map: Optional[Dict] = None,
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
) -> List[Dict]:
    """Per-group IoU mean/std/count + recall rows, sorted by group name."""
    buckets: Dict[str, List[float]] = {}
    for rec in records:
        buckets.setdefault(_group_key(rec, group, take_map), []).append(rec["iou"])
    rows = []
    for name in sorted(buckets):
        arr = np.asarray(buckets[name])
        rows.append({
            "group": name,
            "count": int(arr.size),
            "mean_iou": float(arr.mean()),
            "std_iou": float(arr.std()),
            **recall_at_thresholds(arr, thresholds),
        })
    return rows


def seen_unseen_split(
    records: List[Dict], unseen_takes: Sequence[str],
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
) -> Dict[str, Dict]:
    """The notebook's held-out-environment analysis: takes whose recording
    environment was unseen during training vs the rest."""
    unseen = set(unseen_takes)
    split = {"seen": [], "unseen": []}
    for rec in records:
        split["unseen" if rec["take"] in unseen else "seen"].append(rec["iou"])
    out = {}
    for name, vals in split.items():
        arr = np.asarray(vals) if vals else np.asarray([])
        out[name] = {
            "count": int(arr.size),
            "mean_iou": float(arr.mean()) if arr.size else float("nan"),
            **recall_at_thresholds(arr, thresholds),
        }
    return out


def plot_grouped_bars(
    tables: Dict[str, List[Dict]], out_path: str, metric: str = "mean_iou"
) -> None:
    """Grouped bar chart comparing models per group (notebook's
    plot_grouped_bars). One bar cluster per group, one bar per model."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model_names = list(tables)
    groups = sorted({row["group"] for t in tables.values() for row in t})
    width = 0.8 / max(1, len(model_names))
    x = np.arange(len(groups))
    fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(groups)), 4))
    for mi, mn in enumerate(model_names):
        by_group = {r["group"]: r for r in tables[mn]}
        vals = [by_group.get(g, {}).get(metric, np.nan) for g in groups]
        errs = [by_group.get(g, {}).get("std_iou", 0.0) for g in groups]
        ax.bar(x + mi * width, vals, width, yerr=errs, capsize=2,
               label=os.path.basename(mn))
    ax.set_xticks(x + width * (len(model_names) - 1) / 2)
    ax.set_xticklabels(groups, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel(metric)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def write_csv(rows: List[Dict], path: str) -> None:
    if not rows:
        return
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)


def run(
    result_paths: Sequence[str],
    takes_json: Optional[str] = None,
    unseen_file: Optional[str] = None,
    group: str = "task",
    out_dir: Optional[str] = None,
    plot: bool = False,
) -> Dict:
    take_map = load_take_task_map(takes_json) if takes_json else None
    unseen = []
    if unseen_file:
        with open(unseen_file) as f:
            unseen = [ln.strip() for ln in f if ln.strip()]

    report: Dict = {"models": {}}
    tables: Dict[str, List[Dict]] = {}
    for path in result_paths:
        with open(path) as f:
            results = json.load(f)
        records = flatten_results(results)
        all_ious = [r["iou"] for r in records]
        entry = {
            "n_narrations": len(records),
            "overall": {
                "mean_iou": float(np.mean(all_ious)) if records else float("nan"),
                **recall_at_thresholds(all_ious),
            },
            "by_group": stratify(records, group, take_map),
        }
        if unseen:
            entry["seen_unseen"] = seen_unseen_split(records, unseen)
        report["models"][path] = entry
        tables[path] = entry["by_group"]

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "stratified_report.json"), "w") as f:
            json.dump(report, f, indent=2)
        for path, rows in tables.items():
            base = os.path.splitext(os.path.basename(path))[0]
            write_csv(rows, os.path.join(out_dir, f"{base}_{group}.csv"))
        if plot:
            plot_grouped_bars(
                tables, os.path.join(out_dir, f"stratified_{group}.png")
            )
    return report


def main(argv: Optional[List[str]] = None) -> Dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("results", nargs="+", help="test_results_epoch_N.json files")
    ap.add_argument("--takes", default=None, help="EgoExo4D takes.json")
    ap.add_argument("--unseen", default=None,
                    help="file with one held-out take name per line")
    ap.add_argument("--group", default="task",
                    choices=("task", "parent_task", "take"))
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args(argv)
    report = run(args.results, args.takes, args.unseen, args.group,
                 args.out_dir, args.plot)
    for path, entry in report["models"].items():
        print(path, json.dumps(entry["overall"]))
    return report


if __name__ == "__main__":
    main()
