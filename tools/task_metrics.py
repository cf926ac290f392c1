#!/usr/bin/env python3
"""Aggregate TaskEnd metrics from a Spark event log: total executor run
time, GC time, shuffle read/write, memory/disk spill, serialization time.
Also bins task time by stage-name prefix to localize inflation.
Usage: task_metrics.py <eventlog-file-or-dir>"""
import sys, json, os, glob
from collections import defaultdict

path = sys.argv[1]
files = sorted(glob.glob(os.path.join(path, "*")), key=os.path.getmtime) \
    if os.path.isdir(path) else [path]

for f in files:
    tot = defaultdict(float)
    n_tasks = 0
    stage_names = {}
    by_stage = defaultdict(lambda: defaultdict(float))
    with open(f, errors="replace") as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageSubmitted" or ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stage_names[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:50]
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics")
                if not m:
                    continue
                n_tasks += 1
                sid = e["Stage ID"]
                vals = {
                    "run_s": m.get("Executor Run Time", 0) / 1e3,
                    "cpu_s": m.get("Executor CPU Time", 0) / 1e9,
                    "gc_s": m.get("JVM GC Time", 0) / 1e3,
                    "deser_s": m.get("Executor Deserialize Time", 0) / 1e3,
                    "ser_s": m.get("Result Serialization Time", 0) / 1e3,
                    "mem_spill_mb": m.get("Memory Bytes Spilled", 0) / 1e6,
                    "disk_spill_mb": m.get("Disk Bytes Spilled", 0) / 1e6,
                    "shuf_read_mb": m.get("Shuffle Read Metrics", {}).get("Local Bytes Read", 0) / 1e6
                        + m.get("Shuffle Read Metrics", {}).get("Remote Bytes Read", 0) / 1e6,
                    "shuf_write_mb": m.get("Shuffle Write Metrics", {}).get("Shuffle Bytes Written", 0) / 1e6,
                    "shuf_write_s": m.get("Shuffle Write Metrics", {}).get("Shuffle Write Time", 0) / 1e9,
                    "input_mb": m.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6,
                    "output_mb": m.get("Output Metrics", {}).get("Bytes Written", 0) / 1e6,
                }
                for k, v in vals.items():
                    tot[k] += v
                    by_stage[sid][k] += v
    if not n_tasks:
        continue
    print(f"== {os.path.basename(f)}  ({n_tasks} tasks)")
    print("  " + " ".join(f"{k}={tot[k]:.1f}" for k in
        ["run_s", "cpu_s", "gc_s", "deser_s", "mem_spill_mb", "disk_spill_mb",
         "shuf_read_mb", "shuf_write_mb", "shuf_write_s", "input_mb", "output_mb"]))
    top = sorted(by_stage.items(), key=lambda kv: -kv[1]["run_s"])[:12]
    for sid, v in top:
        print(f"  stage {sid:4d} run {v['run_s']:7.1f}s cpu {v['cpu_s']:7.1f}s "
              f"gc {v['gc_s']:5.1f}s spill {v['disk_spill_mb']:6.0f}MB "
              f"shufW {v['shuf_write_mb']:6.0f}MB  {stage_names.get(sid, '?')}")
