#!/bin/bash
# SCALE_r16 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100, 50-min hard cap per gate. Two campaigns:
#
#   tools/run_scale_r16.sh                      # adversarial-replicated lake
#   FRESH=1 tools/run_scale_r16.sh out.fresh    # growing-cardinality lake
#
# r16 changes vs r15:
#  - ann_ivf_sq8_append joins the battery: builds the tier's index,
#    then times appending a FIXED 2k-vector delta - append cost must
#    track the delta, not the corpus (judge r15 ask #6).
#  - the dedup shingle-Jaccard family rides PPJoin prefix-filter
#    candidates (the growing-cardinality dedup_clusters fix, ask #1)
#    and q_golden_record adds the length-gap inner-loop break (ask #4).
#  - merge_scale.py stamps a `calibration` key (q21 x10) so cross-round
#    seconds self-normalize for machine drift (ask #8).
set -u
OUT=${1:-/tmp/scale_curve_r16.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
FRESH=${FRESH:-0}
if [ "$FRESH" = "1" ]; then
  DEFGATES="q_golden_record dedup_clusters dedup_substring ann_sq8_rerank"
else
  DEFGATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_golden_record q21_waiting_orders dedup_prefix_filter ann_ivf_pq_trained_rerank_scaled ann_ivf_sq8_rerank ann_ivf_sq8_persisted ann_ivf_sq8_append ann_knn_join_scaled emb_knn_components_scaled dedup_substring ann_sq8_rerank"
fi
GATES=${GATES:-$DEFGATES}
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    SPARK_GRAFT_CURVE_FRESH="$FRESH" \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r16_${FRESH}_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
