#!/bin/bash
# Round-11 scale campaign. Protocol changes vs r10 (VERDICT r10 item 1 —
# metric stability):
#   * the sf0.1 / 100x bench pair runs INTERLEAVED TWICE in one host
#     window (A/B/A/B), and the assembler takes per-query min-of-2 on
#     both sides and publishes per-query spread — so a real regression
#     is distinguishable from host drift (r10's median moved
#     3.79x -> 4.67x with unchanged plans);
#   * fixture guards use a completion MARKER written after generation
#     (ADVICE r10: a single-table guard would accept an aborted or
#     table-filtered generation);
#   * d23_span_containment joins the annotated in-run output-bound
#     contracts (linear twin d19) in the assembler.
# Everything else matches r10: 25x probe block for the quadratic parity
# contracts, 400x ladder-end probes, e2e at 100x/200x.
# SPARK_DRIVER_MEM=12g per the measured 12g-vs-32g GCLocker finding.
set -euo pipefail
cd "$(dirname "$0")/../.."

export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g SPARK_GRAFT_WARM_ROOT=/root/testdata

echo "== fixtures (marker-guarded) =="
gen() { # gen <dir> <factor> [tables]
  local dir=$1; shift
  [ -f "$dir/.graft_complete" ] || {
    tools/run.sh graft.tmp.GenSf1Natural "$dir" "$@" && touch "$dir/.graft_complete"; }
}
gen /tmp/sf10n 100
gen /tmp/sf2.5n 25 documents,embeddings,part
gen /tmp/sf20n 200 documents
gen /tmp/sf40n 400 documents,part

EXCL=d6_simhash_pairs,d12_simhash_repdup,d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted

echo "== interleaved A/B/A/B: sf0.1 then 100x, twice =="
for run in a b; do
  echo "-- sf0.1 run $run --"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    tools/run.sh graft.Bench > /tmp/bench_sf01_r11_$run.out 2>/tmp/bench_sf01_r11_$run.err
  echo "-- 100x run $run --"
  SPARK_GRAFT_SF_DIR=/tmp/sf10n SPARK_GRAFT_EXCLUDE=$EXCL \
    tools/run.sh graft.Bench > /tmp/bench_sf10n_r11_$run.out 2>/tmp/bench_sf10n_r11_$run.err
done

echo "== 25x contract probe block =="
SPARK_GRAFT_SF_DIR=/tmp/sf2.5n \
SPARK_GRAFT_ONLY=d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted \
  tools/run.sh graft.Bench > /tmp/bench_sf25x_r11.out 2>/tmp/bench_sf25x_r11.err

echo "== 400x ladder-end probes =="
SPARK_GRAFT_SF_DIR=/tmp/sf40n \
SPARK_GRAFT_ONLY=d16_editdist_repdup,t31_bpe_learn,d19_dup_span_fraction \
  tools/run.sh graft.Bench > /tmp/bench_sf40n_r11.out 2>/tmp/bench_sf40n_r11.err

echo "== e2e 100x (5M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf10n /tmp/e2e_sf10n_r11.json 5000000
echo "== e2e 200x (10M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf20n /tmp/e2e_sf20n_r11.json 10000000

echo "== assemble =="
python3 tools/devtools/assemble_scale_r11.py \
  --sf01 /tmp/bench_sf01_r11_a.out,/tmp/bench_sf01_r11_b.out \
  --sfn /tmp/bench_sf10n_r11_a.out,/tmp/bench_sf10n_r11_b.out \
  --factor 100 \
  --contracts25 /tmp/bench_sf25x_r11.out --probes400 /tmp/bench_sf40n_r11.out \
  --e2e100 /tmp/e2e_sf10n_r11.json --e2e200 /tmp/e2e_sf20n_r11.json \
  --out BENCH_sf10n_r11.json \
  --note "r11 protocol: sf0.1/100x pairs interleaved A/B/A/B in one host window, per-query min-of-2 on both sides with published spread; d23 annotated as an in-run output-bound contract (twin d19); quadratic parity contracts (d5/d10/d15) at the 25x probe slice; 400x ladder-end probes + 200x e2e"
echo "== done =="
