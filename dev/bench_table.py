#!/usr/bin/env python3
"""Render the BASELINE.md round-N summary rows from a bench artifact.

Usage: dev/bench_table.py [target/bench.json]
Prints the measured-results table body + per-level scaling detail so the
doc update is a paste, not a transcription (transcription typos caused
stale numbers in earlier rounds).
"""
import json, sys

p = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
d = json.load(open(p))
s = d["scaling"]
jw = d["jsonl_workflow"]
lv = {l["cpus"]: l for l in s["levels"]}

print(f"queries: {len(d['queries'])} (incl. images_pipeline), n_failed={d['n_failed']}")
print(f"| Scaling efficiency 2->8 | {s['pair_efficiencies']['2->8']:.3f} "
      f"(min {lv[2]['sec']:.1f} s -> {lv[8]['sec']:.1f} s) |")
print(f"| Scaling efficiency 8->32 | {s['pair_efficiencies']['8->32']:.3f} |")
print(f"| JSONL workflow | {jw['mb_per_sec']:.2f} MB/s on 32 threads = "
      f"{jw['mb_per_sec']/32:.3f} MB/s/core ({jw['text_mb']:.1f} MB / {jw['sec']:.2f} s) |")
print(f"| Images pipeline | {d['mb_per_sec']:.2f} MB/s / {d['images_per_sec']:.0f} images/s "
      f"({d['queries']['images_pipeline']:.1f} s) |")
for cpus in sorted(lv):
    l = lv[cpus]
    runs = ", ".join(f"{r:.1f}" for r in l["all_runs"])
    loads = ", ".join(f"{x:.1f}" for x in l["load1_at_start"])
    print(f"  local[{cpus}]: min {l['sec']:.1f} s of [{runs}] (release loads: [{loads}])")
print(f"pipeline runs: {[round(r,1) for r in d['pipeline_runs']]} loads {d['pipeline_load1']}")
print(f"jsonl runs: {[round(r,1) for r in jw['runs']]} loads {jw['load1']}")
slow = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:8]
print("slowest queries:", ", ".join(f"{k} {v:.2f}s" for k, v in slow))
