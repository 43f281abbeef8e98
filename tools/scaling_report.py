#!/usr/bin/env python3
"""Combine two ScalingBench level JSONs into the BENCH.md efficiency row."""
import json, sys, datetime, pathlib

low = json.load(open(sys.argv[1]))
high = json.load(open(sys.argv[2]))
thr_l, thr_h = low["urls_per_sec"], high["urls_per_sec"]
speedup = thr_h / thr_l
eff = speedup / (high["cores"] / low["cores"])
line = (f'{{"metric":"scaling_efficiency","value":{eff:.3f},"unit":"ratio",'
        f'"low":{json.dumps(low)},"high":{json.dumps(high)},"speedup":{speedup:.2f}}}')
print(line)

bench = pathlib.Path("BENCH.md")
if not bench.exists():
    bench.write_text(
        "# BENCH — measured scaling evidence\n\n"
        "Frontier-dequeue + fetch-schedule rounds (Bench.crawlRounds): the identical\n"
        "job and input at two parallelism levels, each in its own JVM; efficiency =\n"
        "(thr_high/thr_low) normalized by the core ratio (north-rule criterion >= 0.8).\n\n"
        "| date | input | low | high | speedup | efficiency |\n|---|---|---|---|---|---|\n")
row = (f'| {datetime.date.today()} | {low["pages"]} pages, budget {low["budget"]}, '
       f'text x{low["text_repeat"]} | local[{low["cores"]}]: {thr_l:.0f} urls/s | '
       f'local[{high["cores"]}]: {thr_h:.0f} urls/s | {speedup:.2f}x | {eff:.2f} |\n')
with bench.open("a") as f:
    f.write(row)
print(f"appended to BENCH.md: {row.strip()}")
