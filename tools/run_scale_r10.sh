#!/bin/bash
# SCALE_r10 runner: one fresh JVM per gate (the merge_scale.py contract;
# sbt runMain forks with build.sbt's JDK17 add-opens + SPARK_DRIVER_MEM),
# tiers sf0.1 -> x10 -> x100; dedup_minhash_lsh is policy-capped at
# <=10x inside ScaleCurve itself.
set -u
OUT=${1:-/tmp/scale_curve_r10.out}
: > "$OUT"
GATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_pagerank q_golden_record q21_waiting_orders"
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    SPARK_DRIVER_MEM=96g \
    sbt -batch "runMain graft.ScaleCurve 10,100" \
    > /tmp/scale_curve_r10_$g.log 2>&1
  echo "[runner] $g exit=$? $(date +%T)" >&2
  grep -h '"metric":"scale_curve"' /tmp/scale_curve_r10_$g.log >> "$OUT"
done
