#!/usr/bin/env python3
"""Merge a bench run's per-query lines into BENCH_FLOORS.json.

Usage: merge_floors.py <bench_lines.jsonl> [floors.json]
Floors are the min of the existing floor and the new clean time; new
queries enter at their first measured time. Driver-side tooling only.
"""
import json
import sys

lines_path = sys.argv[1]
floors_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FLOORS.json"

with open(floors_path) as f:
    floors = json.load(f)

new = lowered = added = 0
with open(lines_path) as f:
    for line in f:
        d = json.loads(line)
        if "query" not in d or "sec" not in d:
            continue
        q, s = d["query"], d["sec"]
        if q not in floors:
            floors[q] = s
            added += 1
        elif s < floors[q]:
            floors[q] = round(s, 2)
            lowered += 1

with open(floors_path, "w") as f:
    json.dump(dict(sorted(floors.items())), f, indent=1)
    f.write("\n")
print(f"{len(floors)} floors ({added} added, {lowered} lowered)")
