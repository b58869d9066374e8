#!/bin/bash
# SCALE_r10 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100; dedup_minhash_lsh is policy-capped at
# <=10x inside ScaleCurve itself. 50-min hard cap per gate (the r9
# probe budget was 25 min per TIER); a timed-out gate leaves no JSON
# line, which merge_scale.py surfaces as a missing gate.
set -u
OUT=${1:-/tmp/scale_curve_r10.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
GATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_pagerank q_golden_record q21_waiting_orders"
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r10_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
