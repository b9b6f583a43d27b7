"""Compare the current bench_result.json against the judge's perf gate:
each query vs its FIRST-recorded value across the git history of
bench_result.json, with the formal re-baselines from BASELINE.md
("Per-query re-baselines" sections) overriding the first record.

Usage: python scripts/baseline_check.py [result.json]
Prints every query at >= 1.5x with its ratio, plus suite medians.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Formal re-baselines (BASELINE.md) — adjudicated values that replace
# the first-recorded number for the 2x gate.
REBASELINES = {
    "text_token_stats": 0.57,
    "ann_pq_topk": 2.15,
    "ref_count_orders": 0.12,
    "stream_matview_refresh": 3.99,
    "tpch_q12_priority_by_returnflag": 0.45,
    "tpch_q20_excess_suppliers": 0.58,
    "text_fingerprint": 0.19,
    "ref_max_orderdate": 0.12,
    "ref_notnull_drop": 0.42,
    "events_retention_cohorts": 0.45,
    "dedup_embedding_cosine": 1.92,
}


def first_recorded() -> dict[str, float]:
    """First value each query ever recorded in bench_result.json, at
    sf0.1 records only (sf1 runs overwrite the file and are excluded)."""
    shas = subprocess.run(
        ["git", "log", "--reverse", "--format=%H", "--", "bench_result.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    base: dict[str, float] = {}
    for sha in shas:
        try:
            raw = subprocess.run(
                ["git", "show", f"{sha}:bench_result.json"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout
            rec = json.loads(raw)
        except Exception:
            continue
        if float(rec.get("sf", 0.1)) != 0.1:
            continue
        for q, v in rec.get("queries", {}).items():
            if isinstance(v, (int, float)) and q not in base:
                base[q] = float(v)
    base.update(REBASELINES)
    return base


def main() -> None:
    path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "bench_result.json"
    cur = json.loads(path.read_text())
    assert float(cur.get("sf", 0.1)) == 0.1, "compare sf0.1 records only"
    base = first_recorded()
    ratios = {}
    for q, v in cur["queries"].items():
        if not isinstance(v, (int, float)):
            print(f"ERROR row: {q}: {v}")
            continue
        if q in base:
            ratios[q] = float(v) / base[q]
    med = statistics.median(ratios.values())
    agg = sum(cur["queries"][q] for q in ratios) / sum(base[q] for q in ratios)
    print(f"{len(ratios)} comparable queries  median {med:.3f}x  aggregate {agg:.3f}x")
    over = {q: r for q, r in ratios.items() if r >= 1.5}
    for q, r in sorted(over.items(), key=lambda kv: -kv[1]):
        print(f"  {r:5.2f}x  {q}  ({cur['queries'][q]:.2f}s vs {base[q]:.2f}s)")
    n2 = sum(1 for r in ratios.values() if r >= 2.0)
    print(f"queries >= 2.0x: {n2}")


if __name__ == "__main__":
    main()
