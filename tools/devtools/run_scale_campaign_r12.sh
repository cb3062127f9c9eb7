#!/bin/bash
# Round-12 scale campaign. Changes vs r11:
#   * fixtures regenerate with the NATURAL vocabulary (GenSf1Natural's
#     r12 default: ~4k-word Zipf draw) — contamination/near-dup rates at
#     100x now measure gate behavior, not trigram-space saturation
#     (VERDICT r11 missing #2). Fresh marker-guarded dirs.
#   * isolated min-of-2 block for the r11 worst non-contract ratios
#     (d14/d20/c10) — separates real scaling from in-set neighbor/GC
#     effects before chasing "regressions".
#   * semantic-dedup 100x e2e probe (CurateApp nearDupMethod=semantic
#     over documents x embeddings — VERDICT r11 missing #3).
#   * fuzzy-decontamination stress on the template-heavy corpus (8M
#     candidate pairs through the measured-gate joins on a 3g driver —
#     VERDICT r11 finding 1 done-criterion).
# Protocol otherwise identical to r11: interleaved A/B/A/B min-of-2 with
# published spread, 25x probe block, 400x ladder probes, 100x/200x e2e.
# SPARK_DRIVER_MEM=12g per the measured 12g-vs-32g GCLocker finding.
set -euo pipefail
cd "$(dirname "$0")/../.."

export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g SPARK_GRAFT_WARM_ROOT=/root/testdata

echo "== fixtures (marker-guarded, natural vocab) =="
gen() { # gen <dir> <factor> [tables]
  local dir=$1; shift
  [ -f "$dir/.graft_complete_r12" ] || {
    rm -rf "$dir"
    tools/run.sh graft.tmp.GenSf1Natural "$dir" "$@" && touch "$dir/.graft_complete_r12"; }
}
gen /tmp/sf10n 100
gen /tmp/sf2.5n 25 documents,embeddings,part
gen /tmp/sf20n 200 documents
gen /tmp/sf40n 400 documents,part
# degenerate documents-only fixture for the overlap-saturation stress
gen /tmp/sf10n_degen 100 documents degenerate

EXCL=d6_simhash_pairs,d12_simhash_repdup,d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted
PROF=d14_embedding_neardup_scaled,d20_semdedup_scaled,c10_dynamic_pruning

echo "== interleaved A/B/A/B: sf0.1 then 100x, twice =="
for run in a b; do
  echo "-- sf0.1 run $run --"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    tools/run.sh graft.Bench > /tmp/bench_sf01_r12_$run.out 2>/tmp/bench_sf01_r12_$run.err
  echo "-- 100x run $run --"
  SPARK_GRAFT_SF_DIR=/tmp/sf10n SPARK_GRAFT_EXCLUDE=$EXCL \
    tools/run.sh graft.Bench > /tmp/bench_sf10n_r12_$run.out 2>/tmp/bench_sf10n_r12_$run.err
done

echo "== isolated profile block (r11 worst non-contract ratios) =="
for run in a b; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$PROF \
    tools/run.sh graft.Bench > /tmp/bench_prof01_r12_$run.out 2>/dev/null
  SPARK_GRAFT_SF_DIR=/tmp/sf10n SPARK_GRAFT_ONLY=$PROF \
    tools/run.sh graft.Bench > /tmp/bench_prof100_r12_$run.out 2>/dev/null
done

echo "== 25x contract probe block =="
SPARK_GRAFT_SF_DIR=/tmp/sf2.5n \
SPARK_GRAFT_ONLY=d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted \
  tools/run.sh graft.Bench > /tmp/bench_sf25x_r12.out 2>/tmp/bench_sf25x_r12.err

echo "== 400x ladder-end probes =="
SPARK_GRAFT_SF_DIR=/tmp/sf40n \
SPARK_GRAFT_ONLY=d16_editdist_repdup,t31_bpe_learn,d19_dup_span_fraction \
  tools/run.sh graft.Bench > /tmp/bench_sf40n_r12.out 2>/tmp/bench_sf40n_r12.err

echo "== e2e 100x (5M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf10n /tmp/e2e_sf10n_r12.json 5000000
echo "== e2e 200x (10M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf20n /tmp/e2e_sf20n_r12.json 10000000

echo "== semantic-dedup 100x e2e probe =="
tools/run.sh graft.tmp.SemanticE2e /tmp/sf10n /tmp/e2e_semantic_r12.json

echo "== fuzzy-decontamination stress (3g driver) =="
SPARK_DRIVER_MEM=3g tools/run.sh graft.tmp.FuzzyStress template:200000:97 \
  2>/dev/null | tail -1 > /tmp/fuzzy_stress_r12.json
SPARK_DRIVER_MEM=3g tools/run.sh graft.tmp.FuzzyStress /tmp/sf10n_degen \
  2>/dev/null | tail -1 > /tmp/fuzzy_stress_degen_r12.json
python3 - <<'PYEOF'
import json
t = json.load(open('/tmp/fuzzy_stress_r12.json'))
d = json.load(open('/tmp/fuzzy_stress_degen_r12.json'))
json.dump({"template_200k_97t": t, "degenerate_500k": d,
           "note": "template corpus = the real band-saturation regime "
                   "(8M candidate pairs); degenerate vocab saturates the "
                   "overlap gate but not band space (max bucket 6)"},
          open('/tmp/fuzzy_stress_r12.json', 'w'), indent=1)
PYEOF

echo "== assemble =="
python3 tools/devtools/assemble_scale_r12.py \
  --sf01 /tmp/bench_sf01_r12_a.out,/tmp/bench_sf01_r12_b.out \
  --sfn /tmp/bench_sf10n_r12_a.out,/tmp/bench_sf10n_r12_b.out \
  --factor 100 \
  --contracts25 /tmp/bench_sf25x_r12.out --probes400 /tmp/bench_sf40n_r12.out \
  --e2e100 /tmp/e2e_sf10n_r12.json --e2e200 /tmp/e2e_sf20n_r12.json \
  --semantic100 /tmp/e2e_semantic_r12.json \
  --stress /tmp/fuzzy_stress_r12.json \
  --prof01 /tmp/bench_prof01_r12_a.out,/tmp/bench_prof01_r12_b.out \
  --profn /tmp/bench_prof100_r12_a.out,/tmp/bench_prof100_r12_b.out \
  --out BENCH_sf10n_r12.json \
  --note "r12: natural-vocab fixtures (4k-word Zipf; pre-r12 31-word vocab saturated trigram space); interleaved A/B/A/B min-of-2 with published spread; isolated min-of-2 block for d14/d20/c10; semantic-dedup 100x e2e; fuzzy-decontamination measured-gate stress (8M pairs, 3g driver)"
echo "== done =="
