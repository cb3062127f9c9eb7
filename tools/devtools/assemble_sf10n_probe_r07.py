#!/usr/bin/env python3
"""Assemble the 100x scale-probe artifact: pair a 30-query sf10n bench run
(heavy tail + production contracts + sentinels) with a same-day sf0.1 run
of the SAME subset and report per-query 100x-data ratios against the
linear bound.

Usage: assemble_sf10n_probe.py [sf10n.out] [out.json] [sf01.out]
"""
import json, sys

sf10_out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf10n_probe.out"
out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10n_probe_r07.json"
base_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_sf01_probe100.out"

def last_total(path):
    rows = None
    tot = None
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric"'):
                d = json.loads(ln)
                if "queries" in d:
                    rows = d
                else:
                    tot = d
    if rows is None or tot is None:
        raise SystemExit(f"no bench JSON lines in {path}")
    return rows, tot

run_q, run_t = last_total(sf10_out)
base_q, base_t = last_total(base_path)
q10 = run_q["queries"]
base = base_q["queries"]
common = sorted(set(q10) & set(base))
ratios = {k: q10[k] / max(base[k], 1e-9) for k in common}
over = {k: round(r, 1) for k, r in ratios.items() if r > 100.0}
med = sorted(ratios.values())[len(ratios) // 2]
artifact = {
    "round": 7,
    "note": "100x scale probe of the 9 queries ADDED in round 7 (q13/q18/t25/t28/t29/j12/v11/d21/gr5): natural-distribution scale-100 fixture (60M lineitem, 500k docs, 200k embeddings, 1M events; fresh draws, realistic clone rates) vs a same-session sf0.1 run of the same subset. Both runs: local[32], 12g heap, min-of-2 timing.",
    "sf0_1_total_sec": round(base_t["value"], 1),
    "sf10n_total_sec": round(run_t["value"], 1),
    "sf10n_first_pass_total_sec": float(str(run_t.get("first_pass_total", 0))),
    "n_queries": len(common),
    "median_per_query_ratio_100x_data": round(med, 2),
    "max_per_query_ratio_100x_data": round(max(ratios.values()), 1),
    "queries_over_100x": over,
    "sf10n_queries": {k: round(v, 3) for k, v in sorted(q10.items())},
    "sf0_1_queries": {k: round(v, 3) for k, v in sorted(base.items())},
    "ratios_100x_data": {k: round(v, 2) for k, v in sorted(ratios.items())},
    "sf10n_shuffle_mb_total": float(str(run_t.get("shuffle_mb_total", 0))),
    "sf10n_spill_mb_total": float(str(run_t.get("spill_mb_total", 0))),
}
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"wrote {out_path}: {len(common)} queries, median ratio {med:.2f}, "
      f"max {max(ratios.values()):.1f}, over-bound: {len(over)}")
