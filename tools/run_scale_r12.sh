#!/bin/bash
# SCALE_r12 runner: one fresh JVM per gate (the merge_scale.py contract),
# tiers sf0.1 -> x10 -> x100. New this round: the lakes rebuild under the
# .built_v2 marker (embeddings are now SYNTHESIZED per replica — isometric
# transforms, fresh vec_ids — so the ann/emb cells measure real n-fold
# corpora), and the gate list adds the two ANN/embedding scale cells plus
# the re-measured golden-record gate (lev-before-distinct + contraction CC
# this round; the residual growth is the lake's fixed-cents family-size
# artifact, recorded by graft.tools.EntityProbe).
# 50-min hard cap per gate; a timed-out gate leaves no JSON line, which
# merge_scale.py surfaces as a missing gate.
set -u
OUT=${1:-/tmp/scale_curve_r12.out}
: > "$OUT"
CP="$(cat /tmp/graft_cp.txt)"
# default GATES matches the committed SCALE_r12.json exactly (ADVICE r12:
# the two scaled ANN/embedding cells were run via GATES override and
# missing here, so re-running as-is did not reproduce the artifact)
GATES=${GATES:-"dedup_minhash_clusters dedup_clusters dedup_minhash_lsh dedup_minhash_eval q_golden_record q21_waiting_orders dedup_prefix_filter ann_ivf_pq_trained_rerank emb_knn_components ann_knn_join_scaled emb_knn_components_scaled"}
for g in $GATES; do
  echo "[runner] $g start $(date +%T)" >&2
  SPARK_GRAFT_CURVE_ONLY="$g" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CURVE_ITERS=2 \
    timeout 3000 java -Xmx64g -cp "$CP" graft.ScaleCurve 10,100 \
    >> "$OUT" 2>/tmp/scale_curve_r12_$g.err
  echo "[runner] $g exit=$? $(date +%T)" >&2
done
