#!/bin/bash
# Round-13 scale campaign. Focus (VERDICT r12 item 5): make SCALING
# measurable — the sf0.1 suite is scheduling/fixed-overhead-bound (8
# cores beat 32 in r12), so core-scaling evidence must come from a SF
# where data dominates. Protocol:
#   * CORE-SCALING PROBE: a representative 18-query subset at the 100×
#     natural fixture (/tmp/sf10n), run at SPARK_GRAFT_CPUS=8 and =32
#     (Bench honors the env: local[$cpus] + shuffle.partitions=$cpus,
#     min-of-2 per query, per-query artifact via SPARK_GRAFT_BENCH_OUT).
#     The subset mixes data-parallel scans/joins/aggregates with the
#     known latency-bound iterative queries (gr3, t31, c5) so the
#     artifact NAMES which queries scale with cores and which are
#     serial-bound.
#   * FULL 100× RUN at 32 cores — round-over-round comparability with
#     BENCH_sf10n_r12.json (same natural fixtures, same exclusions).
# Fixtures are the r12 natural-vocab ones (marker-guarded, reused).
set -euo pipefail
cd "$(dirname "$0")/../.."

export SPARK_DRIVER_MEM=12g SPARK_GRAFT_WARM_ROOT=/root/testdata

echo "== fixtures (r12 marker-guarded, natural vocab) =="
[ -f /tmp/sf10n/.graft_complete_r12 ] || {
  rm -rf /tmp/sf10n
  SPARK_GRAFT_CPUS=32 tools/run.sh graft.tmp.GenSf1Natural /tmp/sf10n 100 \
    && touch /tmp/sf10n/.graft_complete_r12; }

EXCL=d6_simhash_pairs,d12_simhash_repdup,d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted
# core-scaling subset: data-parallel (scan/join/agg/dedup/span/text) +
# the latency-bound iteratives (gr3/t31/c5) named as serial controls
SCALE_SET=q1_agg,a23_copurchase_pairs,c4_table_diff,d2_minhash_lsh,d3v_simhash64,d11_substring_spans,d18_winnowed_spans,d19_dup_span_fraction,d23_span_containment,t35_perplexity_filter,t10_decontaminate,b1_bloom_semijoin,a17_percentile,e3_scd2,m8_image_dedup,gr3_pagerank,t31_bpe_learn,c5_curate_report

echo "== core-scaling probe at 100x: 8 vs 32 cores =="
for cpus in 8 32; do
  echo "-- sf10n subset @ ${cpus} cores --"
  SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_SF_DIR=/tmp/sf10n \
  SPARK_GRAFT_ONLY=$SCALE_SET \
  SPARK_GRAFT_BENCH_OUT=/tmp/r13/scale_sf10n_c${cpus}.json \
    tools/run.sh graft.Bench \
    > /tmp/r13/scale_sf10n_c${cpus}.out 2>/tmp/r13/scale_sf10n_c${cpus}.err
done

echo "== full 100x run @ 32 cores (r12-comparable) =="
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sf10n SPARK_GRAFT_EXCLUDE=$EXCL \
SPARK_GRAFT_BENCH_OUT=/tmp/r13/bench_sf10n_r13.json \
  tools/run.sh graft.Bench \
  > /tmp/r13/bench_sf10n_r13.out 2>/tmp/r13/bench_sf10n_r13.err

echo "== assemble =="
python3 tools/devtools/assemble_scale_r13.py
