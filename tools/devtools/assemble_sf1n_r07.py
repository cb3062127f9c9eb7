#!/usr/bin/env python3
"""Assemble BENCH_sf1n_r07.json: the natural-sf1 bench run vs a clean
same-code sf0.1 per-query baseline (min-of-2 series on both sides), flagging any
query above the 10x linear bound."""
import json, sys

bench_out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf1n.out"
out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1n_r07.json"

def first_json(path):
    # JVM gc warnings can interleave on stdout ahead of the bench line
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric"'):
                return json.loads(ln)
    raise SystemExit(f"no bench JSON line in {path}")
run = first_json(bench_out)
# comparison base: a clean same-code sf0.1 run (per-query min-of-2 series);
# BENCH_r05.json only preserved the compact tail line, not the query map
base_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_sf01.out"
base_run = first_json(base_path)
base = base_run["queries"]

sf1n = run["queries"]
ratios = {}
over10 = {}
for q, t in sf1n.items():
    b = base.get(q)
    if b and b > 0.05:  # sub-50ms baselines are pure jitter
        ratios[q] = round(t / b, 2)
        if t / b > 10.0:
            over10[q] = {"sf1n_sec": t, "sf0_1_sec": b, "ratio": round(t / b, 1)}

med = sorted(ratios.values())[len(ratios) // 2] if ratios else None
artifact = {
    "round": 7,
    "note": "natural-distribution 10x fixture (/tmp/sf1n, fresh draws via tools/devtools/GenSf1Natural.scala, regenerated for round 7 - /tmp does not persist between rounds). sf0.1 comparison series: a clean same-code, same-host, back-to-back run (min-of-2 both sides, 12g driver heap). Round 7 adds 9 queries to the surface (q13/q18/t25/t28/t29/j12/v11/d21/gr5); headline metric is the per-query 10x ratio within ONE session - shared-host wall totals drift 1.3-1.5x across hours.",
    "sf0_1_total_sec": round(base_run["value"], 1),
    "sf0_1_n_queries": len(base),
    "sf1n_total_sec": round(run["value"], 1),
    "sf1n_first_pass_total_sec": round(run.get("first_pass_total", 0), 1),
    "sf1n_n_queries": len(sf1n),
    "median_per_query_ratio_10x_data": med,
    "n_compared": len(ratios),
    "queries_over_10x": over10,
    "sf1n_queries": {k: round(v, 3) for k, v in sorted(sf1n.items())},
    "sf1n_queries_first_pass": {k: round(v, 3) for k, v in
                                sorted(run.get("queries_first", {}).items())},
}
if "shuffle_mb_total" in run:
    artifact["sf1n_shuffle_mb_total"] = round(run["shuffle_mb_total"], 1)
    artifact["sf1n_spill_mb_total"] = round(run.get("spill_mb_total", 0), 1)
    artifact["sf1n_shuffle_mb_top10"] = dict(sorted(
        run.get("shuffle_mb", {}).items(), key=lambda kv: -kv[1])[:10])

# strategy-probe evidence: the adaptive Jaccard-verify chooser logs its
# decision to stderr; on a natural-clone-rate corpus it must pick the
# direct (non-collapse) path — capture the observed lines verbatim
err_path = bench_out.rsplit(".", 1)[0] + ".err"
try:
    with open(err_path) as f:
        probes = [ln.strip() for ln in f if "[dedup] ngramJaccardPairs" in ln]
    artifact["dedup_strategy_probe"] = probes
except OSError:
    pass

# optional end-to-end runs (CurateApp / GraftApp timed wall-clock at sf1n)
# and the multi-round soak blob, merged verbatim if present
for key, path in [("end_to_end", "/tmp/e2e_sf1n.json"),
                  ("soak", "/tmp/SOAK_r07.json")]:
    try:
        with open(path) as f:
            artifact[key] = json.load(f)
    except OSError:
        pass
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"total {artifact['sf1n_total_sec']}s over {artifact['sf1n_n_queries']} queries; "
      f"median 10x-data ratio {med}; {len(over10)} queries over 10x bound")
for q, d in sorted(over10.items(), key=lambda kv: -kv[1]["ratio"]):
    print(f"  OVER10x {q}: {d['sf1n_sec']:.1f}s vs {d['sf0_1_sec']:.2f}s ({d['ratio']}x)")
