"""Scaling-diagnosis tool: break a Spark event log into per-job wall time,
aggregate task time, and driver-serial gaps.

The north_rule scaling target (≥0.8 efficiency N→4N) fails exactly when wall
time is spent OUTSIDE parallel task execution — driver gaps between jobs
(planning, broadcast builds, commit renames, collects) and under-parallelized
stages. This tool quantifies both from `spark.eventLog.enabled=true` output:

    python tools/analyze_eventlog.py /tmp/spark-events/<app-id> [--cores 16]

Per job: wall, sum of task executorRunTime, effective parallelism
(taskTime/wall), and the idle gap since the previous job ended. The summary
splits total app wall into "in-job" and "between-job (driver-serial)" time —
the latter is the budget that caps scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str):
    events = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return events


def analyze(path: str, cores: int) -> dict:
    events = load(path)
    jobs: dict = {}
    stage_to_job: dict = {}
    stage_task_time: dict = {}
    stage_task_count: dict = {}
    stage_gc_time: dict = {}
    stage_names: dict = {}
    app_start = app_end = None

    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerApplicationStart":
            app_start = e["Timestamp"]
        elif ev == "SparkListenerApplicationEnd":
            app_end = e["Timestamp"]
        elif ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "start": e["Submission Time"],
                "end": None,
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:90],
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
            for s in e.get("Stage Infos", []):
                stage_to_job[s["Stage ID"]] = jid
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            stage_task_time[sid] = stage_task_time.get(sid, 0) + m.get(
                "Executor Run Time", 0
            )
            stage_gc_time[sid] = stage_gc_time.get(sid, 0) + m.get(
                "JVM GC Time", 0
            )
            stage_task_count[sid] = stage_task_count.get(sid, 0) + 1

    rows = []
    prev_end = app_start
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["end"] is None:
            continue
        wall = (j["end"] - j["start"]) / 1000.0
        ttime = sum(stage_task_time.get(s, 0) for s in j["stages"]) / 1000.0
        gc = sum(stage_gc_time.get(s, 0) for s in j["stages"]) / 1000.0
        ntasks = sum(stage_task_count.get(s, 0) for s in j["stages"])
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j["end"]
        rows.append(
            {
                "job": jid,
                "wall_s": round(wall, 2),
                "task_s": round(ttime, 2),
                "gc_s": round(gc, 2),
                "par": round(ttime / wall, 1) if wall > 0.05 else None,
                "gap_s": round(gap, 2),
                "tasks": ntasks,
                "desc": j["desc"],
            }
        )

    in_job = sum(r["wall_s"] for r in rows)
    gaps = sum(r["gap_s"] for r in rows)
    tail = (app_end - prev_end) / 1000.0 if app_end and prev_end else 0.0
    # parallel-deficit: wall the job spent under full-core occupancy
    deficit = sum(
        max(0.0, r["wall_s"] - r["task_s"] / cores) for r in rows
    )
    return {
        "rows": rows,
        "app_wall_s": round(((app_end or prev_end) - app_start) / 1000.0, 2)
        if app_start
        else None,
        "in_job_s": round(in_job, 2),
        "between_job_s": round(gaps, 2),
        "after_last_job_s": round(tail, 2),
        "underparallel_in_job_s": round(deficit, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--min-wall", type=float, default=0.3,
                    help="only print jobs at least this long (or with gaps)")
    args = ap.parse_args()
    res = analyze(args.log, args.cores)
    print(
        f"app_wall={res['app_wall_s']}s in_job={res['in_job_s']}s "
        f"between_job={res['between_job_s']}s after_last={res['after_last_job_s']}s "
        f"underparallel_in_job={res['underparallel_in_job_s']}s"
    )
    print(f"{'job':>4} {'wall':>8} {'task':>9} {'par':>6} {'gap':>7} {'tasks':>6}  desc")
    for r in res["rows"]:
        if r["wall_s"] < args.min_wall and r["gap_s"] < args.min_wall:
            continue
        print(
            f"{r['job']:>4} {r['wall_s']:>8.2f} {r['task_s']:>9.2f} "
            f"{str(r['par']):>6} {r['gap_s']:>7.2f} {r['tasks']:>6}  {r['desc']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
