#!/usr/bin/env python3
"""Assemble a round-9 full-coverage scale artifact: pair an sfN bench run
with a same-session sf0.1 run of the same query set, report per-query
N-x-data ratios against the linear bound, and annotate the deliberately-
quadratic parity contracts (d5, d10) as standalone scale contracts with
their linear production twins, so they are never double-counted as
engine defects.

Coverage is asserted, not assumed: the runner's big JSON line carries
n_universe and the exact exclusion list (SPARK_GRAFT_EXCLUDE), and this
script fails if selected != universe - exclusions or if the two runs
cover different query sets.

Usage: assemble_scale_r09.py <sfN.out> <sf01.out> <out.json> <factor> <note>
"""
import json, sys

sfn_out, sf01_out, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
factor = int(sys.argv[4])
note = sys.argv[5]

# parity contracts, quadratic BY CONSTRUCTION, each with linear twins in
# the same run — annotated, reported separately, never 'over-bound'
CONTRACTS = {
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
    # exactly ONE run per log: a file holding two concatenated runs would
    # silently pair mismatched totals, so >1 total line is an error
    rows_seen, tot_seen = [], []
    with open(path) as f:
        for ln in f:
            if ln.startswith('{"metric"'):
                d = json.loads(ln)
                (rows_seen if "queries" in d else tot_seen).append(d)
    if not rows_seen or not tot_seen:
        raise SystemExit(f"no bench JSON lines in {path}")
    if len(rows_seen) > 1 or len(tot_seen) > 1:
        raise SystemExit(
            f"{path} holds {len(rows_seen)}/{len(tot_seen)} rows/total "
            "bench lines - it concatenates multiple runs; split the logs")
    return rows_seen[0], tot_seen[0]


run_q, run_t = last_lines(sfn_out)
base_q, base_t = last_lines(sf01_out)
qn, base = run_q["queries"], base_q["queries"]

# coverage contract
universe = run_q.get("n_universe")
excluded = sorted(run_q.get("excluded", []))
if universe is not None:
    assert len(qn) == universe - len(excluded), \
        f"sfN run covers {len(qn)} != {universe} - {len(excluded)}"
missing_in_base = sorted(set(qn) - set(base))
assert not missing_in_base, f"sf0.1 run missing: {missing_in_base}"

common = sorted(set(qn) & set(base))
ratios = {k: qn[k] / max(base[k], 1e-9) for k in common}
contracts = {}
for k, meta in CONTRACTS.items():
    if k in ratios:
        contracts[k] = {
            "sf0_1_sec": round(base[k], 2),
            f"sf{factor//10}n_sec": round(qn[k], 2),
            f"ratio_{factor}x_data": round(ratios[k], 1),
            **meta,
            "twin_ratios": {t: round(ratios[t], 2) for t in meta["twins"] if t in ratios},
        }
over = {k: round(r, 1) for k, r in ratios.items()
        if r > factor and k not in CONTRACTS}
med = sorted(ratios.values())[len(ratios) // 2]
artifact = {
    "round": 9,
    "note": note,
    "n_universe": universe,
    "excluded": excluded,
    "sf0_1_total_sec": round(sum(base[k] for k in common), 1),
    f"sf{factor//10}n_total_sec": round(sum(qn[k] for k in common), 1),
    f"sf{factor//10}n_first_pass_total_sec": float(str(run_t.get("first_pass_total", 0))),
    "n_queries": len(common),
    f"median_per_query_ratio_{factor}x_data": round(med, 2),
    f"queries_over_{factor}x_excl_contracts": over,
    "scale_contracts_standalone": contracts,
    f"sf{factor//10}n_queries": {k: round(qn[k], 3) for k in common},
    "sf0_1_queries": {k: round(base[k], 3) for k in common},
    f"ratios_{factor}x_data": {k: round(ratios[k], 2) for k in common},
    f"sf{factor//10}n_shuffle_mb_total": float(str(run_t.get("shuffle_mb_total", 0))),
    f"sf{factor//10}n_spill_mb_total": float(str(run_t.get("spill_mb_total", 0))),
    f"sf{factor//10}n_spilled_queries": run_q.get("spilled_queries", {}),
}
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
nonc = [r for k, r in ratios.items() if k not in CONTRACTS]
print(f"wrote {out_path}: {len(common)} queries (universe {universe}, "
      f"excluded {excluded}), median {med:.2f}, "
      f"max-non-contract {max(nonc, default=0.0):.1f}, over-bound: {len(over)}, "
      f"spill {artifact[f'sf{factor//10}n_spill_mb_total']:.0f} MB")
