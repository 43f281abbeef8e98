#!/usr/bin/env python3
"""Summarize multi-draw ScalingBench output: per-draw wall-clock and
executor-CPU-seconds-normalized efficiency, medians across draws.

Wall efficiency (the north-rule criterion): (thr_H / thr_L) / (cores_H /
cores_L) on steady-state urls/sec. CPU efficiency: work per executor CPU
second at HIGH vs LOW — parallelism-independent for a plan with no serial
stage, and robust to hypervisor noise that inflates wall time at both
levels unevenly (CPU seconds only grow with real contention, so this is
the statistic that separates "plan doesn't scale" from "box is loud").

Usage: scaling_median.py LOW HIGH DIR [--markdown]
"""
import json, glob, re, statistics, sys

low_c, high_c, d = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
draws = {}
for p in glob.glob(f"{d}/draw*_level_*.json"):
    m = re.search(r"draw(\d+)_level_(\d+)\.json", p)
    if not m:
        continue
    draws.setdefault(int(m.group(1)), {})[int(m.group(2))] = json.load(open(p))

rows = []
for i in sorted(draws):
    pair = draws[i]
    if low_c not in pair or high_c not in pair:
        continue
    lo, hi = pair[low_c], pair[high_c]
    wall = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (high_c / low_c)
    cpu_lo = lo["fetches_all"] / lo["executor_cpu_sec"]
    cpu_hi = hi["fetches_all"] / hi["executor_cpu_sec"]
    cpu = cpu_hi / cpu_lo
    rows.append((i, lo["urls_per_sec"], hi["urls_per_sec"], wall, cpu_lo, cpu_hi, cpu,
                 lo.get("shuffle_gb_per_round", 0), hi.get("shuffle_gb_per_round", 0),
                 lo.get("ambient_gbps"), hi.get("ambient_gbps")))

if not rows:
    sys.exit(f"no complete draws in {d}")

wall_med = statistics.median(r[3] for r in rows)
cpu_med = statistics.median(r[6] for r in rows)
has_amb = any(r[9] is not None for r in rows)
amb_hdr = f" ambient GB/s ({low_c}→{high_c}) |" if has_amb else ""
print(f"| draw | local[{low_c}] urls/s | local[{high_c}] urls/s | wall eff | "
      f"urls per CPU-s ({low_c}→{high_c}) | CPU eff | shuffle GB/round ({low_c}→{high_c}) |" + amb_hdr)
print("|---|---|---|---|---|---|---|" + ("---|" if has_amb else ""))
for r in rows:
    amb = f" {r[9]:.0f} → {r[10]:.0f} |" if has_amb and r[9] is not None else (" |" if has_amb else "")
    print(f"| {r[0]} | {r[1]:,.0f} | {r[2]:,.0f} | {r[3]:.2f} | "
          f"{r[4]:,.0f} → {r[5]:,.0f} | {r[6]:.2f} | {r[7]:.2f} → {r[8]:.2f} |" + amb)
print(f"| **median** | | | **{wall_med:.2f}** | | **{cpu_med:.2f}** | |" + (" |" if has_amb else ""))
print(json.dumps({"metric": "scaling_efficiency_multi", "draws": len(rows),
                  "low_cores": low_c, "high_cores": high_c,
                  "wall_eff_median": round(wall_med, 3),
                  "cpu_eff_median": round(cpu_med, 3),
                  "wall_eff_draws": [round(r[3], 3) for r in rows],
                  "cpu_eff_draws": [round(r[6], 3) for r in rows]}))
