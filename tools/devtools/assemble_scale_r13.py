#!/usr/bin/env python3
"""Assemble the round-13 scale artifacts.

1. SCALING_r13.json — the VERDICT r12 item-5 deliverable: per-query
   8-core vs 32-core wall at the 100x natural fixture (data-dominated,
   unlike sf0.1 where fixed per-query overhead made 8 cores beat 32).
   Each query is classified:
     parallel      speedup_8to32 >= 2.0 (>= half the 4x core ratio)
     partial       1.2 <= speedup < 2.0
     serial-bound  speedup < 1.2 (named; iterative/latency-bound shapes)
2. BENCH_sf10n_r13.json — full 100x run at 32 cores, r12-comparable
   (same natural fixtures, same exclusions).
"""
import json

def load(p):
    with open(p) as f:
        return json.load(f)

c8 = load("/tmp/r13/scale_sf10n_c8.json")
c32 = load("/tmp/r13/scale_sf10n_c32.json")

qs8, qs32 = c8["queries"], c32["queries"]
common = sorted(set(qs8) & set(qs32))
rows = {}
for q in common:
    sp = qs8[q] / qs32[q] if qs32[q] > 0 else None
    cls = ("parallel" if sp >= 2.0 else
           "partial" if sp >= 1.2 else "serial-bound")
    rows[q] = {"sec_8c": round(qs8[q], 3), "sec_32c": round(qs32[q], 3),
               "speedup_8to32": round(sp, 2), "class": cls}

out = {
    "round": 13,
    "note": ("core-scaling probe at the 100x natural fixture (VERDICT "
             "r12 item 5): sf0.1 is fixed-overhead-bound (8c beat 32c "
             "in r12), so scaling evidence comes from a data-dominated "
             "SF. min-of-2 per query per side, local[8] vs local[32] "
             "with shuffle.partitions matched to cores by the Bench "
             "env contract."),
    "fixture": "/tmp/sf10n (500k docs, natural vocab, r12 marker)",
    "core_ratio": 4.0,
    "n_queries": len(common),
    "total_sec_8c": round(sum(qs8[q] for q in common), 1),
    "total_sec_32c": round(sum(qs32[q] for q in common), 1),
    "per_query": rows,
    "parallel_queries": [q for q in common if rows[q]["class"] == "parallel"],
    "partial_queries": [q for q in common if rows[q]["class"] == "partial"],
    "serial_bound_queries": [q for q in common if rows[q]["class"] == "serial-bound"],
}
with open("/root/repo/SCALING_r13.json", "w") as f:
    json.dump(out, f, indent=1)
print("SCALING_r13.json:",
      f"{out['total_sec_8c']}s @8c vs {out['total_sec_32c']}s @32c,",
      f"{len(out['parallel_queries'])} parallel /",
      f"{len(out['partial_queries'])} partial /",
      f"{len(out['serial_bound_queries'])} serial-bound")

full = load("/tmp/r13/bench_sf10n_r13.json")
full_out = {
    "round": 13,
    "note": ("full 100x natural-fixture run at 32 cores, r12-comparable "
             "(same fixtures/exclusions; r12 total was 1421.1s over the "
             "same excluded set)"),
    "n_queries": len(full["queries"]),
    "total_sec": round(full["value"], 1),
    "first_pass_total_sec": full.get("first_pass_total"),
    "shuffle_mb_total": full.get("shuffle_mb_total"),
    "spill_mb_total": full.get("spill_mb_total"),
    "spilled_queries": full.get("spilled_queries"),
    "excluded": full.get("excluded"),
    "queries": {k: round(v, 3) for k, v in full["queries"].items()},
    "shuffle_mb": {k: round(v, 3) for k, v in full.get("shuffle_mb", {}).items()},
}
with open("/root/repo/BENCH_sf10n_r13.json", "w") as f:
    json.dump(full_out, f, indent=1)
print("BENCH_sf10n_r13.json:", full_out["total_sec"], "s,",
      full_out["n_queries"], "queries, shuffle",
      full_out["shuffle_mb_total"], "MB")
