"""Per-query engine/DuckDB ratio table from a duck_bench artifact and a
graft.Bench artifact over the same SF dir.
Usage: python3 tools/ratio.py DUCK_BENCH_sf10.json BENCH_r07_sf10.json
"""
import json, sys

duck = json.load(open(sys.argv[1]))["queries"]
bench = json.load(open(sys.argv[2]))["queries"]
common = sorted(set(duck) & set(bench))
worst = []
dt_total = st_total = 0.0
for name in common:
    d, s = duck[name], bench[name]
    if d <= 0 or s <= 0:
        print(f"{name:28s} spark={s:8.3f}s duck={d:8.3f}s SKIP")
        continue
    dt_total += d
    st_total += s
    r = s / d
    worst.append((r, name, s, d))
    print(f"{name:28s} spark={s:8.3f}s duck={d:8.3f}s ratio={r:6.2f}x")
print(f"\nTOTAL over {len(common)} common queries: "
      f"spark={st_total:.2f}s duck={dt_total:.2f}s "
      f"ratio={st_total / dt_total:.2f}x")
print("worst 5:")
for r, name, s, d in sorted(worst, reverse=True)[:5]:
    print(f"  {name:28s} {r:6.2f}x ({s:.2f}s vs {d:.2f}s)")
