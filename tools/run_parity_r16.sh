#!/bin/bash
# PARITY_r16 campaign: Verify the sf1 tier (the x10 replicated lake =
# 6M-row lineitem) and hash-compare against DuckDB running the same
# oracle SQL on the same parquet.
#
# r16 tier (27 gates): the r15 20-gate tier
#   + text battery reach (judge r15 ask #7): text_quality,
#     text_bigram_lm, corpus_url_parse, corpus_url_dedup,
#     text_rolling_fp — §2.5 had never been parity-checked past sf0.1
#   + the two heaviest newly file-sink-ported replays (ask #2 done-bar):
#     stream_interval_replay, stream_session_replay
#
# Usage: tools/run_parity_r16.sh [outdir]
set -u
OUTDIR=${1:-/tmp/verify_r16_parity}
CP="$(cat /tmp/graft_cp.txt)"
GATES="q1_pricing_summary,q3_top_orders,q5_region_revenue,q6_forecast_revenue,q12_ship_mode,q18_large_orders,q21_waiting_orders,q_pagerank,q_golden_record,dedup_clusters,dedup_minhash_clusters,dedup_minhash_eval,dedup_minhash_lsh,dedup_substring,ann_sq8_rerank,ann_ivf_sq8_rerank,ann_ivf_sq8_persisted,stream_cdc_replay,stream_outer_replay,stream_static_replay,text_quality,text_bigram_lm,corpus_url_parse,corpus_url_dedup,text_rolling_fp,stream_interval_replay,stream_session_replay"
SPARK_GRAFT_VERIFY_ONLY="$GATES" SPARK_GRAFT_CPUS=32 \
  java -Xmx100g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" graft.Verify /tmp/graft_curve_x10 "$OUTDIR" \
  2>&1 | grep -E "\[verify\]" || true
COMPARE_SKIP=dedup_clusters COMPARE_TIMEOUT=1800 \
  python3 tools/compare.py "$OUTDIR" /tmp/graft_curve_x10 | tee /tmp/parity_r16.log
python3 tools/make_parity_sf1.py /tmp/parity_r16.log > PARITY_r16_sf1.json
python3 - <<'EOF'
import json
j = json.load(open("PARITY_r16_sf1.json"))
print("n_gates", j["n_gates"], "ok", j["n_ok"], "skip", j["n_skip"], "fail", j["n_fail"])
EOF
