"""Grounded-SAM score vs grounding-quality correlation (gSAM_vis.ipynb).

Scripted production counterpart of the reference's `train/gSAM_vis.ipynb`:
the notebook does NOT run grounded-SAM — it joins a precomputed per-clip SAM
score map (`gSAM_test_map.json`: clip_id -> scalar) onto the keystep test
csv, matches each (narration, video) pair against the trainer's
`test_results_epoch_N.json` per-narration IoU/loss rows, and then
  1. scatter-plots loss vs min-max-normalized SAM score with a linear
     trendline (notebook cell 4: np.polyfit degree 1, zero-loss rows
     dropped), and
  2. aggregates per-scenario loss statistics with name normalization
     ('cooking*' -> 'cooking', 'covid*' -> 'covid', purely numeric scenario
     tokens skipped — notebook cell 5).

Consumes OUR trainer dump format (train/trainer.py::EgoExoTrainer.evaluate):
each entry {'loss_dict': (B, N) per-narration IoU rows, 'metadata':
{'narration': [[...]], 'video_id': [...], 'cam_id': [...]}} — the same
semantic fields as the reference's flat per-batch lists (reference
main_egoexo4d_distributed.py:355-357).

CLI:
    python -m exoground_tpu.tools.gsam_correlation \
        results.json --gsam_map gSAM_test_map.json \
        --keystep_csv egoexo4d_exos_keysteps_test.csv --out_dir plots/
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_sam_table(
    map_path: str, keystep_csv: str
) -> Dict[Tuple[str, str], float]:
    """(narration, video_id) -> SAM score join (notebook cells 1-2).

    keystep_csv needs 'clip_id', 'narration' and 'video_id' columns; rows
    whose clip_id is absent from the score map are dropped (the notebook's
    notna() filter)."""
    with open(map_path) as f:
        gsam_map = json.load(f)
    table: Dict[Tuple[str, str], float] = {}
    dup: set = set()
    with open(keystep_csv, newline="") as f:
        for row in csv.DictReader(f):
            sam = gsam_map.get(str(row["clip_id"]))
            if sam is None:
                continue
            key = (row["narration"], row["video_id"])
            if key in table:
                # the notebook's len(matched_rows)==1 guard: ambiguous
                # (narration, video) pairs are excluded from the join
                dup.add(key)
                continue
            table[key] = float(sam)
    for key in dup:
        table.pop(key, None)
    return table


def collect_loss_sam(
    results: List[Dict], table: Dict[Tuple[str, str], float]
) -> Tuple[List[Tuple[float, float]], Dict[str, List[float]]]:
    """Match trainer rows against the SAM table (notebook cell 3).

    Returns (loss, sam) tuples for matched narrations plus the
    scenario -> losses dict (scenario = second '_' token of
    f"{video_id}_{cam_id}", i.e. the take name's scenario word). Per-
    narration flattening rides stratify_results.flatten_results — the same
    dump traversal (and its ragged-row robustness) the other notebook
    counterpart uses."""
    from exoground_tpu.tools.stratify_results import flatten_results

    tuples: List[Tuple[float, float]] = []
    scenario: Dict[str, List[float]] = {}
    for rec in flatten_results(results):
        real_id = f"{rec['take']}_{rec['cam']}"
        parts = real_id.split("_")
        scen = parts[1] if len(parts) > 1 else parts[0]
        bucket = scenario.setdefault(scen, [])
        sam = table.get((rec["narration"], real_id))
        if sam is not None:
            tuples.append((rec["iou"], sam))
            bucket.append(rec["iou"])
    return tuples, scenario


def fit_trendline(
    tuples: Sequence[Tuple[float, float]]
) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Zero-loss filter + min-max SAM normalization + degree-1 polyfit
    (notebook cell 4). Returns (x=norm_sam, y=loss, slope, intercept)."""
    kept = [t for t in tuples if t[0] != 0.0]
    if len(kept) < 2:
        raise ValueError(f"need >=2 nonzero-loss matches, got {len(kept)}")
    loss, sam = map(np.asarray, zip(*kept))
    lo, hi = sam.min(), sam.max()
    x = (sam - lo) / max(hi - lo, 1e-12)
    slope, intercept = np.polyfit(x, loss, 1)
    return x, loss, float(slope), float(intercept)


def normalize_scenario_name(name: str) -> Optional[str]:
    """Notebook cell 5's normalization; None means skip (numeric token)."""
    if "cooking" in name:
        return "cooking"
    if "covid" in name:
        return "covid"
    if name.isnumeric():
        return None
    return name


def scenario_stats(
    scenario: Dict[str, List[float]]
) -> Dict[str, Tuple[float, float, int]]:
    """scenario -> (mean, std, n) after name normalization + merging."""
    merged: Dict[str, List[float]] = {}
    for name, vals in scenario.items():
        norm = normalize_scenario_name(name)
        if norm is None:
            continue
        merged.setdefault(norm, []).extend(vals)
    return {
        k: (float(np.mean(v)), float(np.std(v)), len(v))
        for k, v in sorted(merged.items())
        if v
    }


def notebook_yerr(std: float, n: int) -> float:
    """The notebook's error-bar quantity is std/len (cell 5) — neither std
    nor the standard error (std/sqrt(n)); kept verbatim for figure parity."""
    return std / max(n, 1)


def plot_correlation(x, y, slope, intercept, out_png: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.scatter(x, y, s=14, alpha=0.6, label="narrations")
    xs = np.linspace(0.0, 1.0, 50)
    ax.plot(xs, slope * xs + intercept, "r-",
            label=f"trend: {slope:.3f}x + {intercept:.3f}")
    ax.set_xlabel("normalized SAM score")
    ax.set_ylabel("grounding IoU / loss")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def plot_scenario_bars(stats, out_png: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(stats)
    means = [stats[k][0] for k in names]
    yerrs = [notebook_yerr(stats[k][1], stats[k][2]) for k in names]
    fig, ax = plt.subplots(figsize=(max(6, len(names)), 5))
    ax.bar(range(len(names)), means, yerr=yerrs, capsize=3)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right")
    ax.set_ylabel("mean IoU / loss")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png


def main(argv: Optional[List[str]] = None) -> Dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("results", help="trainer test_results_epoch_N.json")
    ap.add_argument("--gsam_map", required=True)
    ap.add_argument("--keystep_csv", required=True)
    ap.add_argument("--out_dir", default="gsam_vis")
    args = ap.parse_args(argv)

    with open(args.results) as f:
        results = json.load(f)
    table = load_sam_table(args.gsam_map, args.keystep_csv)
    tuples, scenario = collect_loss_sam(results, table)
    x, y, slope, intercept = fit_trendline(tuples)
    stats = scenario_stats(scenario)

    os.makedirs(args.out_dir, exist_ok=True)
    plot_correlation(
        x, y, slope, intercept, os.path.join(args.out_dir, "gsam_scatter.png")
    )
    plot_scenario_bars(
        stats, os.path.join(args.out_dir, "scenario_bars.png")
    )
    summary = {
        "n_matched": len(tuples),
        "slope": slope,
        "intercept": intercept,
        "scenarios": {k: {"mean": m, "std": s, "n": n}
                      for k, (m, s, n) in stats.items()},
    }
    with open(os.path.join(args.out_dir, "gsam_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "scenarios"}))
    return summary


if __name__ == "__main__":
    main()
