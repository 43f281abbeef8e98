#!/usr/bin/env python3
"""Analyze a Spark event log: task-occupancy timeline vs wall-clock.
Finds how much of the run has 0 tasks running (driver-serial time), and
per-job durations with concurrency.

Usage: python3 tools/evlog_analyze.py /tmp/evlog/<app-id>
Accepts a single-file v1 log, or a Spark 4 `eventlog_v2_*` directory
(concatenates its `events_*` parts; .zstd parts are decompressed).
"""
import io, json, os, sys
from collections import defaultdict

path = sys.argv[1]
task_iv = []         # (launch, finish)
job_iv = {}          # job id -> [start, end, ntasks]
stage_names = {}
stage_tasks = defaultdict(lambda: [0, 0.0])  # stage -> [count, total task sec]
app_start = app_end = None


def open_part(p):
    if p.endswith(".zstd"):
        import subprocess
        out = subprocess.run(["zstd", "-dc", p], capture_output=True, check=True).stdout
        return io.StringIO(out.decode("utf-8", errors="replace"))
    return open(p)


def iter_lines(path):
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("events_"))
        for p in parts:
            with open_part(p) as f:
                yield from f
    else:
        with open_part(path) as f:
            yield from f

if True:
    f = iter_lines(path)
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            task_iv.append((ti["Launch Time"], ti["Finish Time"]))
            sid = ev.get("Stage ID")
            stage_tasks[sid][0] += 1
            stage_tasks[sid][1] += (ti["Finish Time"] - ti["Launch Time"]) / 1000
        elif e == "SparkListenerJobStart":
            job_iv[ev["Job ID"]] = [ev["Submission Time"], None]
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in job_iv:
                job_iv[ev["Job ID"]][1] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_names[si["Stage ID"]] = si["Stage Name"]

if not task_iv:
    sys.exit("no tasks found")
t0 = app_start or min(iv[0] for iv in task_iv)
t1 = app_end or max(iv[1] for iv in task_iv)
wall = (t1 - t0) / 1000

# sweep: time with >=1 task running
events = []
for s, e in task_iv:
    events.append((s, 1)); events.append((e, -1))
events.sort()
busy = 0.0
occupied_core_s = sum((e - s) for s, e in task_iv) / 1000
cur = 0; last = None
for ts, d in events:
    if cur > 0 and last is not None:
        busy += (ts - last) / 1000
    cur += d; last = ts
print(f"wall={wall:.1f}s  task-busy={busy:.1f}s  DRIVER-IDLE-GAPS={wall-busy:.1f}s ({100*(wall-busy)/wall:.0f}%)")
print(f"total task core-seconds={occupied_core_s:.0f}  avg concurrency while busy={occupied_core_s/busy:.1f}")

# split the zero-task time: inside a running job (stage-boundary planning,
# AQE re-optimization, scheduler latency) vs outside all jobs (driver code
# between actions)
jiv = sorted((v[0], v[1]) for v in job_iv.values() if v[1])
def merge(ivs):
    out = []
    for s, e in ivs:
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out
merged_jobs = merge(jiv)
merged_tasks = merge(sorted(task_iv))
def overlap(a, b):
    i = j = 0
    tot = 0.0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0]); e = min(a[i][1], b[j][1])
        if e > s:
            tot += e - s
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return tot
job_time = sum(e - s for s, e in merged_jobs) / 1000
busy_in_jobs = overlap(merged_jobs, merged_tasks) / 1000
print(f"zero-task time INSIDE jobs (stage boundaries/AQE)={job_time-busy_in_jobs:.1f}s; "
      f"OUTSIDE jobs (driver between actions)={wall-busy-(job_time-busy_in_jobs):.1f}s; jobs={len(job_iv)}")

# top stages by total task time
print("\ntop stages by task core-seconds:")
for sid, (n, tot) in sorted(stage_tasks.items(), key=lambda kv: -kv[1][1])[:12]:
    name = stage_names.get(sid, "?")[:90]
    print(f"  stage {sid}: {n} tasks, {tot:.1f} core-s — {name}")

# jobs gap analysis: time between consecutive jobs
jobs = sorted((v[0], v[1], k) for k, v in job_iv.items() if v[1])
print("\nlargest inter-job driver gaps:")
gaps = []
for i in range(1, len(jobs)):
    gap = (jobs[i][0] - jobs[i-1][1]) / 1000
    if gap > 0.3:
        gaps.append((gap, jobs[i-1][2], jobs[i][2]))
for gap, a, b in sorted(gaps, reverse=True)[:12]:
    print(f"  {gap:.2f}s between job {a} and job {b}")
print(f"total inter-job gap time: {sum(g for g,_,_ in gaps):.1f}s over {len(gaps)} gaps")
