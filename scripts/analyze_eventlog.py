"""Summarize a Spark event log (or all logs in /tmp/spark-events):
per-job wall, task-time, and callsite; plus the driver-gap total (time
inside the query not covered by any running job = planning/analysis/
commit overhead). Companion to profile_queries.py."""

from __future__ import annotations

import json
import os
import sys


def lines(path: str):
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            fp = os.path.join(path, f)
            if os.path.isfile(fp) and "events" in f:
                with open(fp) as fh:
                    yield from fh
    else:
        with open(path) as fh:
            yield from fh


def analyze(path: str, top: int = 14) -> None:
    jobs: dict[int, dict] = {}
    s2j: dict[int, int] = {}
    for line in lines(path):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "t0": ev["Submission Time"],
                "t1": None,
                "site": "",
                "tasks": 0,
                "run": 0,
            }
            for s in ev.get("Stage Infos", []):
                s2j[s["Stage ID"]] = jid
                jobs[jid]["site"] = s.get("Stage Name", "")
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            jid = s2j.get(ev["Stage ID"])
            if jid is not None:
                m = ev.get("Task Metrics") or {}
                jobs[jid]["tasks"] += 1
                jobs[jid]["run"] += m.get("Executor Run Time", 0)
    done = [j for j in jobs.values() if j["t1"]]
    if not done:
        print("  (no completed jobs)")
        return
    t_first = min(j["t0"] for j in done)
    t_last = max(j["t1"] for j in done)
    span = (t_last - t_first) / 1000
    # driver gap: merge job intervals, subtract from span
    ivs = sorted((j["t0"], j["t1"]) for j in done)
    covered = 0
    cur_a, cur_b = ivs[0]
    for a, b in ivs[1:]:
        if a > cur_b:
            covered += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    covered += cur_b - cur_a
    gap = span - covered / 1000
    print(
        f"  jobs={len(done)} span={span:.2f}s in-job={covered / 1000:.2f}s "
        f"driver-gap={gap:.2f}s"
    )
    for j in sorted(done, key=lambda j: j["t0"] - j["t1"])[:top]:
        w = (j["t1"] - j["t0"]) / 1000
        print(
            f"    {w:6.2f}s tasks={j['tasks']:>4} run={j['run'] / 1000:7.1f}s  "
            f"{j['site'][:90]}"
        )


def main() -> None:
    args = sys.argv[1:]
    if args:
        for a in args:
            print(a)
            analyze(a)
        return
    d = "/tmp/spark-events"
    for app in sorted(os.listdir(d)):
        print(app)
        analyze(os.path.join(d, app))


if __name__ == "__main__":
    main()
