#!/bin/bash
# SCALE_r13 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100, 50-min hard cap per gate. Two campaigns:
#
#   tools/run_scale_r13.sh                      # adversarial-replicated lake
#   FRESH=1 tools/run_scale_r13.sh out.fresh    # growing-cardinality lake
#
# r13 gate list = the r12 list plus ann_ivf_pq_trained_rerank_scaled (the
# count-derived IVF coarse tier next to its fixed-c=10 sibling) plus the
# two late-r13 coverage gates with corpus-sized inputs (dedup_substring,
# ann_sq8_rerank). The FRESH
# campaign re-runs ONLY the two gates whose x100 superlinearity was
# diagnosed as the replicated lake's fixed-cardinality artifact
# (q_golden_record, dedup_clusters) — on a lake whose cents/letters
# cardinality grows with n, their cells must come back near-linear
# (r13 judge ask #7: turn the argument into a measurement).
set -u
OUT=${1:-/tmp/scale_curve_r13.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
FRESH=${FRESH:-0}
if [ "$FRESH" = "1" ]; then
  DEFGATES="q_golden_record dedup_clusters"
else
  DEFGATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_golden_record q21_waiting_orders dedup_prefix_filter ann_ivf_pq_trained_rerank ann_ivf_pq_trained_rerank_scaled emb_knn_components ann_knn_join_scaled emb_knn_components_scaled dedup_substring ann_sq8_rerank"
fi
GATES=${GATES:-$DEFGATES}
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    SPARK_GRAFT_CURVE_FRESH="$FRESH" \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r13_${FRESH}_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
