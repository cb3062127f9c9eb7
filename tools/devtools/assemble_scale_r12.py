#!/usr/bin/env python3
"""Assemble the round-12 scale artifact.

Protocol changes vs r10 (VERDICT r10 finding 1 — metric stability):
the sf0.1 and 100x benches each run TWICE, interleaved A/B/A/B inside
one host window; --sf01/--sfn take comma-separated log lists. Per query
the headline number is min-of-N on each side, and the artifact publishes
per-query SPREAD ((max-min)/min per side) plus the median ratio of every
individual pairing, so a real regression separates from host drift.

d23_span_containment joins the annotated in-run output-bound contracts
(linear twin d19 — same winnowed-pair family as d11/d18).

a21_mad_outliers is listed under regime_gated_queries: its quality gate
switches plan at the AdaptiveWidth boundary, so the sf0.1 denominator
runs the small-regime window median while the 100x numerator runs the
large-regime selection median — the ratio compares two different optimal
plans (same-plan scaling of the selection form is ~4x per 100x,
measured 3.1 -> 12.5 s).
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
    "d23_span_containment": {
        "contract": "oriented containment pairs, output-bound "
                    "(d18 winnowed-pair family)",
        "twins": ["d19_dup_span_fraction"],
    },
}
REGIME_GATED = {
    "a21_mad_outliers": "AdaptiveWidth-gated median: sf0.1 runs the "
        "small-regime window plan, 100x the selection plan; same-plan "
        "scaling of the selection form is ~4x per 100x (3.1 -> 12.5 s "
        "measured)",
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


def min_of_runs(paths):
    """Per-query min across runs + per-query spread; totals from run A."""
    runs = [last_lines(p) for p in paths]
    qmaps = [r[0]["queries"] for r in runs]
    keys = set(qmaps[0])
    for q in qmaps[1:]:
        if set(q) != keys:
            raise SystemExit(f"runs of {paths} cover different query sets")
    mins = {k: min(q[k] for q in qmaps) for k in keys}
    spread = {k: round((max(q[k] for q in qmaps) - mins[k]) / max(mins[k], 1e-9), 3)
              for k in keys}
    return mins, spread, [q for q in qmaps], runs[0]


ap = argparse.ArgumentParser()
for a in ("sf01", "sfn", "contracts25", "probes400", "e2e100", "e2e200",
          "semantic100", "stress", "prof01", "profn", "out", "note"):
    ap.add_argument(f"--{a}", required=True)
ap.add_argument("--factor", type=int, default=100)
args = ap.parse_args()

sfn_paths = args.sfn.split(",")
sf01_paths = args.sf01.split(",")
qn, spread_n, qn_runs, (run_q, run_t) = min_of_runs(sfn_paths)
base, spread_b, base_runs, (base_q, base_t) = min_of_runs(sf01_paths)

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
med = sorted(ratios.values())[len(ratios) // 2]
# median ratio of every individual pairing (run i of sfn vs run i of
# sf0.1) — the band a single-shot median would have landed in
pair_medians = []
for i in range(min(len(qn_runs), len(base_runs))):
    pr = sorted(qn_runs[i][k] / max(base_runs[i][k], 1e-9) for k in common)
    pair_medians.append(round(pr[len(pr) // 2], 2))

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

# ---- isolated min-of-2 for the r11 worst non-contract ratios ---------
# (d14/d20/c10 measured alone in the same host window: the in-set numbers
# carry neighbor/GC effects the isolated block removes)
pn, _, _, _ = min_of_runs(args.profn.split(","))
p0, _, _, _ = min_of_runs(args.prof01.split(","))
prof_isolated = {k: {"sf0_1_sec": round(p0[k], 2), "sfn_sec": round(pn[k], 2),
                     f"ratio_{args.factor}x_data": round(pn[k] / max(p0[k], 1e-9), 1)}
                 for k in sorted(pn)}

high_spread = {k: {"sfn_spread": spread_n[k], "sf0_1_spread": spread_b[k]}
               for k in common if max(spread_n[k], spread_b[k]) > 0.3}

artifact = {
    "round": 12,
    "note": args.note,
    "n_universe": universe,
    "n_runs_per_side": {"sf0_1": len(sf01_paths), "sfn": len(sfn_paths)},
    "excluded_convention": CONVENTION_EXCLUDED,
    "excluded_probe_contracts": sorted(PROBE_CONTRACTS),
    "sf0_1_total_sec": round(sum(base[k] for k in common), 1),
    f"sf{args.factor//10}n_total_sec": round(sum(qn[k] for k in common), 1),
    "n_queries": len(common),
    f"median_per_query_ratio_{args.factor}x_data": round(med, 2),
    "median_ratio_per_pairing": pair_medians,
    "n_queries_spread_over_30pct": len(high_spread),
    "high_spread_queries": high_spread,
    f"queries_over_{args.factor}x_excl_contracts": over,
    "regime_gated_queries": REGIME_GATED,
    "scale_contracts_in_run": inrun,
    "scale_contracts_probe_25x": contracts25,
    "probes_400x": probes400,
    "e2e_100x": json.load(open(args.e2e100)),
    "e2e_200x": json.load(open(args.e2e200)),
    "e2e_semantic_100x": json.load(open(args.semantic100)),
    "fuzzy_stress": json.load(open(args.stress)),
    "profile_isolated_minof2": prof_isolated,
    f"sf{args.factor//10}n_queries": {k: round(qn[k], 3) for k in common},
    "sf0_1_queries": {k: round(base[k], 3) for k in common},
    f"ratios_{args.factor}x_data": {k: round(ratios[k], 2) for k in common},
    f"sf{args.factor//10}n_query_spread": {k: spread_n[k] for k in common},
    "sf0_1_query_spread": {k: spread_b[k] for k in common},
    f"sf{args.factor//10}n_shuffle_mb_total": float(str(run_t.get("shuffle_mb_total", 0))),
    f"sf{args.factor//10}n_spill_mb_total": float(str(run_t.get("spill_mb_total", 0))),
    f"sf{args.factor//10}n_spilled_queries": run_q.get("spilled_queries", {}),
}
with open(args.out, "w") as f:
    json.dump(artifact, f, indent=1)
nonc = [r for k, r in ratios.items() if k not in INRUN_CONTRACTS]
print(f"wrote {args.out}: {len(common)} queries (universe {universe}), "
      f"median {med:.2f} (pairings {pair_medians}), "
      f"max-non-contract {max(nonc, default=0.0):.1f}, over-bound: {len(over)}, "
      f"spread>30%: {len(high_spread)}, "
      f"spill {artifact[f'sf{args.factor//10}n_spill_mb_total']:.0f} MB")
