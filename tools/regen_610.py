"""Regenerate the SURVEY 6.10 accepted-constant registry table from a
committed bench pair, carrying forward each retained row's adjudication
evidence from the current SURVEY table and flagging rows that need a new
probe (entered the >2x set without one).

Usage: python3 tools/regen_610.py DUCK_BENCH_sf10.json BENCH_r14_sf10.json
Prints the new markdown table + a membership diff; does NOT edit SURVEY.md.
"""
import json, re, sys

duck = json.load(open(sys.argv[1]))["queries"]
bench = json.load(open(sys.argv[2]))["queries"]

# parse the existing table: | query | s | duck | ratio | adjudication | evidence |
old = {}
in_610 = False
for line in open("SURVEY.md"):
    if line.startswith("### 6.10"):
        in_610 = True
        continue
    if in_610 and line.startswith("### "):
        break
    if in_610 and line.startswith("| q") or in_610 and line.startswith("| etl"):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) >= 6:
            old[cells[0]] = (cells[4], cells[5])

rows = []
for name in sorted(set(duck) & set(bench)):
    d, s = duck[name], bench[name]
    if d <= 0 or s <= 0:
        continue
    r = s / d
    if r >= 2.0:
        rows.append((r, name, s, d))
rows.sort(reverse=True)

print("| Query | r14 s | DuckDB s | Ratio | Adjudication | Evidence |")
print("|---|---|---|---|---|---|")
needs_probe = []
for r, name, s, d in rows:
    adj, ev = old.get(name, ("floor", "NEEDS PROBE (new >2x member this round)"))
    if "NEEDS PROBE" in ev:
        needs_probe.append(name)
    print(f"| {name} | {s:.2f} | {d:.3f} | {r:.1f}× | {adj} | {ev} |")

kept = {n for _, n, _, _ in rows}
print()
print("left the table (now <2x):", sorted(set(old) - kept))
print("entered the table:", sorted(kept - set(old)))
print("needs probe:", needs_probe)
