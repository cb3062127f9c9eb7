#!/usr/bin/env python3
"""Assemble the round-10 scale artifact.

Protocol changes vs r9 (VERDICT r9 item 5): the three deliberately-
quadratic standalone parity contracts (d5, d10, d15) no longer run at
full 100x every round — they move to a REDUCED-SLICE probe block at 25x
with a ratio-vs-quadratic-theory assertion, like the d6/d12 exclusion
convention but still measured. Their linear production twins (d14,
d16, d19, d18) stay in the full-coverage 100x run. The in-run
output-bound contracts (d11, j12) remain annotated as before.

Inputs (all produced in one host window, sf0.1 first):
  --sf01 <log>        full sf0.1 bench (no exclusions)
  --sfn <log>         100x bench, exclusions = d6,d12 (convention) +
                      d5,d10,d15 (probe block)
  --factor <int>      data factor of --sfn vs sf0.1 (100)
  --contracts25 <log> 25x bench, SPARK_GRAFT_ONLY=d5,d10,d15
  --probes400 <log>   400x bench, SPARK_GRAFT_ONLY=d16,t31,d19
  --e2e100 <json>     E2eSf1n output at the 100x fixture
  --e2e200 <json>     E2eSf1n output at the 200x fixture
  --out <json>
  --note <str>
"""
import argparse, json

CONVENTION_EXCLUDED = ["d12_simhash_repdup", "d6_simhash_pairs"]
PROBE_CONTRACTS = {
    "d5_embedding_neardup": {
        "contract": "fixed 4-plane parity, quadratic by construction",
        "twins": ["d14_embedding_neardup_scaled"],
    },
    "d10_blocked_editdist": {
        "contract": "blocked all-pairs parity, quadratic in block size",
        "twins": ["d15_editdist_sorted", "d16_editdist_repdup"],
    },
    "d15_editdist_sorted": {
        "contract": "SNM candidates expanded to id pairs; output-bound "
                    "(pair multiplicities grow with clone density)",
        "twins": ["d16_editdist_repdup"],
    },
}
INRUN_CONTRACTS = {
    "j12_interval_overlap": {
        "contract": "materialized overlap pairs, output-bound by contract",
        "twins": ["j13_overlap_stats"],
    },
    "d11_substring_spans": {
        "contract": "exact span pairs, output tracks corpus span-pair density",
        "twins": ["d18_winnowed_spans", "d19_dup_span_fraction"],
    },
}


def last_lines(path):
    rows_seen, tot_seen = [], []
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric"'):
                d = json.loads(ln)
                (rows_seen if "queries" in d else tot_seen).append(d)
    if not rows_seen or not tot_seen:
        raise SystemExit(f"no bench JSON lines in {path}")
    if len(rows_seen) > 1 or len(tot_seen) > 1:
        raise SystemExit(f"{path} concatenates multiple runs; split the logs")
    return rows_seen[0], tot_seen[0]


ap = argparse.ArgumentParser()
for a in ("sf01", "sfn", "contracts25", "probes400", "e2e100", "e2e200",
          "out", "note"):
    ap.add_argument(f"--{a}", required=True)
ap.add_argument("--factor", type=int, default=100)
args = ap.parse_args()

run_q, run_t = last_lines(args.sfn)
base_q, base_t = last_lines(args.sf01)
qn, base = run_q["queries"], base_q["queries"]

universe = run_q["n_universe"]
excluded = sorted(run_q.get("excluded", []))
want_excluded = sorted(CONVENTION_EXCLUDED + list(PROBE_CONTRACTS))
assert excluded == want_excluded, f"{excluded} != {want_excluded}"
assert len(qn) == universe - len(excluded), \
    f"sfN covers {len(qn)} != {universe} - {len(excluded)}"
missing_in_base = sorted(set(qn) - set(base))
assert not missing_in_base, f"sf0.1 run missing: {missing_in_base}"

common = sorted(set(qn) & set(base))
ratios = {k: qn[k] / max(base[k], 1e-9) for k in common}
inrun = {}
for k, meta in INRUN_CONTRACTS.items():
    inrun[k] = {
        "sf0_1_sec": round(base[k], 2),
        "sfn_sec": round(qn[k], 2),
        f"ratio_{args.factor}x_data": round(ratios[k], 1),
        **meta,
        "twin_ratios": {t: round(ratios[t], 2)
                        for t in meta["twins"] if t in ratios},
    }
over = {k: round(r, 1) for k, r in ratios.items()
        if r > args.factor and k not in INRUN_CONTRACTS}
med = sorted(ratios.values())[len(ratios) // 2]

# ---- reduced-slice 25x contract probe -------------------------------
c25_q, c25_t = last_lines(args.contracts25)
C25_FACTOR = 25
contracts25 = {}
for k, meta in PROBE_CONTRACTS.items():
    assert k in c25_q["queries"], f"25x probe missing {k}"
    r = c25_q["queries"][k] / max(base[k], 1e-9)
    bound = C25_FACTOR * C25_FACTOR  # quadratic theory at 25x data
    assert r <= bound, f"{k}: 25x ratio {r:.1f} exceeds quadratic bound {bound}"
    contracts25[k] = {
        "sf0_1_sec": round(base[k], 2),
        "sf2_5n_sec": round(c25_q["queries"][k], 2),
        "ratio_25x_data": round(r, 1),
        "quadratic_theory_bound_25x": bound,
        **meta,
        f"twin_ratios_{args.factor}x": {t: round(ratios[t], 2)
                                        for t in meta["twins"] if t in ratios},
    }

# ---- 400x ladder-end probes ------------------------------------------
p400_q, p400_t = last_lines(args.probes400)
probes400 = {}
for k, t400 in sorted(p400_q["queries"].items()):
    r400 = t400 / max(base[k], 1e-9)
    r100 = ratios.get(k)
    # 100x -> 400x is two doublings
    per_doubling = (t400 / qn[k]) ** 0.5 if k in qn else None
    probes400[k] = {
        "sf0_1_sec": round(base[k], 2),
        f"sf{args.factor//10}n_sec": round(qn.get(k, 0.0), 2),
        "sf40n_sec": round(t400, 2),
        "ratio_400x_data": round(r400, 1),
        f"ratio_{args.factor}x_data": round(r100, 2) if r100 else None,
        "per_doubling_100x_to_400x": round(per_doubling, 2) if per_doubling else None,
    }
probes400["_spill_mb_total"] = float(str(p400_t.get("spill_mb_total", 0)))

artifact = {
    "round": 10,
    "note": args.note,
    "n_universe": universe,
    "excluded_convention": CONVENTION_EXCLUDED,
    "excluded_probe_contracts": sorted(PROBE_CONTRACTS),
    "sf0_1_total_sec": round(sum(base[k] for k in common), 1),
    f"sf{args.factor//10}n_total_sec": round(sum(qn[k] for k in common), 1),
    "n_queries": len(common),
    f"median_per_query_ratio_{args.factor}x_data": round(med, 2),
    f"queries_over_{args.factor}x_excl_contracts": over,
    "scale_contracts_in_run": inrun,
    "scale_contracts_probe_25x": contracts25,
    "probes_400x": probes400,
    "e2e_100x": json.load(open(args.e2e100)),
    "e2e_200x": json.load(open(args.e2e200)),
    f"sf{args.factor//10}n_queries": {k: round(qn[k], 3) for k in common},
    "sf0_1_queries": {k: round(base[k], 3) for k in common},
    f"ratios_{args.factor}x_data": {k: round(ratios[k], 2) for k in common},
    f"sf{args.factor//10}n_shuffle_mb_total": float(str(run_t.get("shuffle_mb_total", 0))),
    f"sf{args.factor//10}n_spill_mb_total": float(str(run_t.get("spill_mb_total", 0))),
    f"sf{args.factor//10}n_spilled_queries": run_q.get("spilled_queries", {}),
}
with open(args.out, "w") as f:
    json.dump(artifact, f, indent=1)
nonc = [r for k, r in ratios.items() if k not in INRUN_CONTRACTS]
print(f"wrote {args.out}: {len(common)} queries (universe {universe}), "
      f"median {med:.2f}, max-non-contract {max(nonc, default=0.0):.1f}, "
      f"over-bound: {len(over)}, "
      f"spill {artifact[f'sf{args.factor//10}n_spill_mb_total']:.0f} MB")
