#!/usr/bin/env python3
"""Render the BASELINE.md per-query table from a graft.Bench JSON line.

Usage: python3 tools/baseline_table.py <bench.json>

Prints the markdown `| query | median sec (sf0.1) | ratio (xprobe) |` rows
(sorted by query name) plus the total, for pasting into BASELINE.md after
a round's final bench run. Dev-only tool (driver-side python env).
"""
import json
import sys

d = json.load(open(sys.argv[1]))
probe = d["probe_sec"]
print(f'# total {d["value"]:.2f}s  probe {probe:.3f}s  n={len(d["queries"])}')
print("| query | median sec (sf0.1) | ratio (×probe) | ratio_local |")
print("|---|---|---|---|")
for q in sorted(d["queries"]):
    rl = d["queries"][q] / d["probe_local"][q]
    print(f'| {q} | {d["queries"][q]:.2f} | {d["queries"][q] / probe:.2f} | {rl:.2f} |')
if d.get("errors"):
    print("ERRORS:", d["errors"])
