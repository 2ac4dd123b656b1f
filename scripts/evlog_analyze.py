#!/usr/bin/env python
"""Post-run Spark event-log analyzer for the scaling investigation.

Reads a Spark event log (QALSH_EVENTLOG_DIR) and reports, over the whole
application window:
  - total covered-by-stage time vs driver-idle gap time (the serial term)
  - per-stage wall, task count, task-time sum, and effective parallelism
    (task-time / stage-wall / cores) for the slowest stages
  - the largest inter-stage gaps with the adjacent stage names

Usage: python scripts/evlog_analyze.py /tmp/evlog/<app-id> [--cores 16]
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    stages = {}  # (stage_id, attempt) -> dict
    tasks_time = {}
    app_start = app_end = None
    for line in open(args.path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                "name": si["Stage Name"].split("\n")[0][:90],
                "ntasks": si["Number of Tasks"],
                "submit": ev.get("Submission Time") or si.get("Submission Time"),
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            k = (si["Stage ID"], si["Stage Attempt ID"])
            d = stages.setdefault(k, {"name": si["Stage Name"].split("\n")[0][:90],
                                      "ntasks": si["Number of Tasks"]})
            d["submit"] = si.get("Submission Time", d.get("submit"))
            d["complete"] = si.get("Completion Time")
        elif e == "SparkListenerTaskEnd":
            k = (ev["Stage ID"], ev["Stage Attempt ID"])
            ti = ev.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) or 0) - (ti.get("Launch Time", 0) or 0)
            tasks_time[k] = tasks_time.get(k, 0) + max(dur, 0)

    done = [
        {"k": k, **v, "task_ms": tasks_time.get(k, 0)}
        for k, v in stages.items()
        if v.get("submit") and v.get("complete")
    ]
    done.sort(key=lambda d: d["submit"])
    if not done:
        sys.exit("no completed stages parsed")
    t0 = app_start or done[0]["submit"]
    t1 = app_end or max(d["complete"] for d in done)
    total = (t1 - t0) / 1000.0

    # merge stage intervals -> covered time; the rest is driver-idle gap
    ivals = sorted((d["submit"], d["complete"]) for d in done)
    covered = 0
    gaps = []
    cur_s, cur_e = ivals[0]
    for s, e in ivals[1:]:
        if s > cur_e:
            gaps.append((cur_e, s))
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    lead = ivals[0][0] - t0
    tail = t1 - cur_e

    print(f"app wall          {total:8.1f}s")
    print(f"stage-covered     {covered/1000:8.1f}s")
    print(f"driver gaps       {sum(e-s for s, e in gaps)/1000:8.1f}s  ({len(gaps)} gaps)")
    print(f"pre-first-stage   {lead/1000:8.1f}s   post-last-stage {tail/1000:8.1f}s")

    print(f"\n== slowest {args.top} stages (wall desc) ==")
    print(f"{'wall_s':>7} {'tasks':>6} {'task_sum_s':>10} {'par_eff':>7}  name")
    for d in sorted(done, key=lambda d: d["complete"] - d["submit"], reverse=True)[: args.top]:
        wall = (d["complete"] - d["submit"]) / 1000.0
        tsum = d["task_ms"] / 1000.0
        eff = tsum / wall / args.cores if wall > 0 else 0
        print(f"{wall:7.1f} {d['ntasks']:6d} {tsum:10.1f} {eff:7.2f}  {d['name']}")

    print(f"\n== largest {args.top} driver gaps ==")
    by_end = sorted(done, key=lambda d: d["complete"])
    for s, e in sorted(gaps, key=lambda g: g[1] - g[0], reverse=True)[: args.top]:
        before = next((d["name"] for d in reversed(by_end) if d["complete"] <= s), "?")
        after = next((d["name"] for d in done if d["submit"] >= e), "?")
        print(f"{(e-s)/1000:7.1f}s  after [{before}] before [{after}]")


if __name__ == "__main__":
    main()
