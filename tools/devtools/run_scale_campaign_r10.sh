#!/bin/bash
# Round-10 scale campaign (run AFTER the full sf0.1 bench at the same HEAD):
#   fixtures -> 100x full-coverage bench (contracts excluded per the r10
#   protocol) -> 25x contract probe block -> 400x ladder-end probes ->
#   e2e at 100x (5M samples) and 200x (10M samples).
# All runs one host window, SPARK_DRIVER_MEM=12g / CPUS=32 matching the
# r9 protocol so per-query ratios compare like-for-like. 12g is not just
# protocol inertia: an r10 A/B at the 100x fixture measured a 32g G1
# heap as 2-10x SLOWER on the shuffle-heavy queries (j3 11.9 -> 115.6 s,
# a15 11.1 -> 37.4, det4 10.6 -> 25.3; GCLocker retry stalls on 32 MB
# humongous allocations) - and 12g per 32-thread worker is also the
# production-faithful shape (real executors run 8-16g heaps).
set -euo pipefail
cd "$(dirname "$0")/../.."

export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g SPARK_GRAFT_WARM_ROOT=/root/testdata

echo "== sf0.1 baseline =="
[ -s /tmp/bench_sf01_r10.out ] || SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/run.sh graft.Bench > /tmp/bench_sf01_r10.out 2>/tmp/bench_sf01_r10.err

echo "== fixtures =="
# d10/d15/d16 do record linkage over PART names; the probe fixtures need
# that table next to documents/embeddings
[ -d /tmp/sf10n/documents.parquet ]   || tools/run.sh graft.tmp.GenSf1Natural /tmp/sf10n 100
[ -d /tmp/sf2.5n/part.parquet ]       || tools/run.sh graft.tmp.GenSf1Natural /tmp/sf2.5n 25 documents,embeddings,part
[ -d /tmp/sf20n/documents.parquet ]   || tools/run.sh graft.tmp.GenSf1Natural /tmp/sf20n 200 documents
[ -d /tmp/sf40n/part.parquet ]        || tools/run.sh graft.tmp.GenSf1Natural /tmp/sf40n 400 documents,part

echo "== 100x full coverage (contracts excluded) =="
SPARK_GRAFT_SF_DIR=/tmp/sf10n \
SPARK_GRAFT_EXCLUDE=d6_simhash_pairs,d12_simhash_repdup,d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted \
  tools/run.sh graft.Bench > /tmp/bench_sf10n_r10.out 2>/tmp/bench_sf10n_r10.err

echo "== 25x contract probe block =="
SPARK_GRAFT_SF_DIR=/tmp/sf2.5n \
SPARK_GRAFT_ONLY=d5_embedding_neardup,d10_blocked_editdist,d15_editdist_sorted \
  tools/run.sh graft.Bench > /tmp/bench_sf25x_r10.out 2>/tmp/bench_sf25x_r10.err

echo "== 400x ladder-end probes =="
SPARK_GRAFT_SF_DIR=/tmp/sf40n \
SPARK_GRAFT_ONLY=d16_editdist_repdup,t31_bpe_learn,d19_dup_span_fraction \
  tools/run.sh graft.Bench > /tmp/bench_sf40n_r10.out 2>/tmp/bench_sf40n_r10.err

echo "== e2e 100x (5M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf10n /tmp/e2e_sf10n_r10.json 5000000
echo "== e2e 200x (10M samples) =="
tools/run.sh graft.tmp.E2eSf1n /tmp/sf20n /tmp/e2e_sf20n_r10.json 10000000

echo "== assemble =="
python3 tools/devtools/assemble_scale_r10.py \
  --sf01 /tmp/bench_sf01_r10.out --sfn /tmp/bench_sf10n_r10.out --factor 100 \
  --contracts25 /tmp/bench_sf25x_r10.out --probes400 /tmp/bench_sf40n_r10.out \
  --e2e100 /tmp/e2e_sf10n_r10.json --e2e200 /tmp/e2e_sf20n_r10.json \
  --out BENCH_sf10n_r10.json \
  --note "r10 protocol: quadratic parity contracts (d5/d10/d15) measured at a 25x reduced slice against the quadratic theory bound; full-coverage 100x runs their linear twins; 400x ladder-end probes + 200x e2e extend the linearity evidence one more doubling"
echo "== done =="
