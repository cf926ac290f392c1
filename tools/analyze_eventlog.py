#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall time, gaps between jobs
(driver-side serial time), and per-stage task-time vs wall (parallelism).
Usage: analyze_eventlog.py <eventlog-file-or-dir> [top_n]"""
import sys, json, os, glob

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
if os.path.isdir(path):
    files = sorted(glob.glob(os.path.join(path, "*")), key=os.path.getmtime)
else:
    files = [path]

for f in files:
    jobs = {}   # id -> (submit, complete, stages)
    stages = {} # id -> dict
    app_start = app_end = None
    with open(f, errors="replace") as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e["Timestamp"]
            elif ev == "SparkListenerApplicationEnd":
                app_end = e["Timestamp"]
            elif ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {"t0": e["Submission Time"], "t1": None,
                                     "stages": [s["Stage ID"] for s in e["Stage Infos"]]}
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                t0, t1 = si.get("Submission Time"), si.get("Completion Time")
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "wall": (t1 - t0) / 1000 if t0 and t1 else 0,
                    "tasks": si["Number of Tasks"]}
    if not jobs:
        continue
    print(f"== {os.path.basename(f)}")
    od = sorted(jobs.items())
    total_job = sum((j["t1"] - j["t0"]) / 1000 for _, j in od if j["t1"])
    # gaps between consecutive jobs = driver-side serial think time
    gaps = []
    for (i1, j1), (i2, j2) in zip(od, od[1:]):
        if j1["t1"] and j2["t0"] > j1["t1"]:
            gaps.append((j2["t0"] - j1["t1"]) / 1000)
    span = (app_end - app_start) / 1000 if app_start and app_end else float("nan")
    print(f"  app span {span:.1f}s | {len(jobs)} jobs, sum job wall {total_job:.1f}s | "
          f"sum inter-job gaps {sum(gaps):.1f}s (max {max(gaps) if gaps else 0:.1f}s)")
    sw = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])[:top_n]
    for sid, s in sw:
        print(f"  stage {sid:4d} wall {s['wall']:6.2f}s tasks {s['tasks']:3d}  {s['name']}")
