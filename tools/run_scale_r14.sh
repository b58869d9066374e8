#!/bin/bash
# SCALE_r14 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100, 50-min hard cap per gate. Two campaigns:
#
#   tools/run_scale_r14.sh                      # adversarial-replicated lake
#   FRESH=1 tools/run_scale_r14.sh out.fresh    # growing-cardinality lake
#
# r14 gate list — RE-TIERED per judge ask #10: the battery carries the
# SCALED ANN/embedding variants only (the production operating points);
# the fixed-parameter siblings (ann_ivf_pq_trained_rerank at c=10,
# emb_knn_components at planes=4, ann_knn_join) remain sf-tier
# correctness gates with their r12/r13 ceilings on record
# (SCALE_r13: 8.13x / 72.8x ratios — measured, declared, not re-run).
# New this round: ann_ivf_sq8_rerank (the IVF+SQ8 composition — its
# x100 cell must read sublinear vs ann_sq8_rerank's 22.8 s full scan).
set -u
OUT=${1:-/tmp/scale_curve_r14.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
FRESH=${FRESH:-0}
if [ "$FRESH" = "1" ]; then
  DEFGATES="q_golden_record dedup_clusters dedup_substring ann_sq8_rerank"
else
  DEFGATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_golden_record q21_waiting_orders dedup_prefix_filter ann_ivf_pq_trained_rerank_scaled ann_ivf_sq8_rerank ann_knn_join_scaled emb_knn_components_scaled dedup_substring ann_sq8_rerank"
fi
GATES=${GATES:-$DEFGATES}
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    SPARK_GRAFT_CURVE_FRESH="$FRESH" \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r14_${FRESH}_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
