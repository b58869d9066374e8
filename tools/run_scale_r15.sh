#!/bin/bash
# SCALE_r15 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100, 50-min hard cap per gate. Two campaigns:
#
#   tools/run_scale_r15.sh                      # adversarial-replicated lake
#   FRESH=1 tools/run_scale_r15.sh out.fresh    # growing-cardinality lake
#
# r15 changes vs r14:
#  - dedup_minhash_lsh's <=10x policy cap is LIFTED (exact-set collapse:
#    banding + verify per distinct token set; the remaining quadratic
#    term is the pair OUTPUT expansion itself) - its x100 cell ships.
#  - ann_ivf_sq8_persisted joins the battery and expands to
#    _build/_query split cells (build-once vs query-many, judge ask #4).
#  - dedup_clusters rides star+rep-pair edges (ngramJaccardClusterEdges)
#    and q_golden_record rides BlockedMatch block-local union-find -
#    both previously-superlinear cells re-measured.
set -u
OUT=${1:-/tmp/scale_curve_r15.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
FRESH=${FRESH:-0}
if [ "$FRESH" = "1" ]; then
  DEFGATES="q_golden_record dedup_clusters dedup_substring ann_sq8_rerank"
else
  DEFGATES="dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_golden_record q21_waiting_orders dedup_prefix_filter ann_ivf_pq_trained_rerank_scaled ann_ivf_sq8_rerank ann_ivf_sq8_persisted ann_knn_join_scaled emb_knn_components_scaled dedup_substring ann_sq8_rerank"
fi
GATES=${GATES:-$DEFGATES}
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    SPARK_GRAFT_CURVE_FRESH="$FRESH" \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r15_${FRESH}_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
