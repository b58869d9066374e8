#!/usr/bin/env python3
"""Assemble PARITY_r10_sf1.json from compare.py output lines.

Usage: make_parity_sf1.py <compare_log> [<compare_log2> ...] > PARITY_r10_sf1.json
Later logs override earlier ones per gate (re-runs with fixed oracles).
"""
import json, re, sys

gates = {}
timeout_s = None
for path in sys.argv[1:]:
    for line in open(path):
        line = line.strip()
        m = re.match(r"OK\s+(\S+)", line)
        if m:
            gates[m.group(1)] = "ok"; continue
        m = re.match(r"SKIP-QUADRATIC-ORACLE (\S+): rows=(\d+)", line)
        if m:
            g, n = m.group(1), int(m.group(2))
            gates[g] = "skip-quadratic-oracle-rows-only" if n > 0 else "fail-0-rows"
            continue
        m = re.match(r"ORACLE-TIMEOUT (\S+) \(> (\d+)", line)
        if m:
            gates[m.group(1)] = f"oracle-timeout>{m.group(2)}s"; continue
        m = re.match(r"(CHECK|EMPTY|ROWSONLY|ORACLE-ERR)\s+(\S+)", line)
        if m:
            tag, g = m.groups()
            if tag == "ROWSONLY":
                gates[g] = "rows-only"
            else:
                gates[g] = "fail-" + tag.lower()

n_ok = sum(1 for v in gates.values() if v == "ok")
n_skip = sum(1 for v in gates.values() if v.startswith("skip"))
n_fail = len(gates) - n_ok - n_skip
out = {
    "gates": dict(sorted(gates.items())),
    "n_gates": len(gates), "n_ok": n_ok, "n_skip": n_skip, "n_fail": n_fail,
    "sf_dir": "/tmp/graft_curve_x10 (sf0.1 replicated 10x by ScaleCurve.buildLake = sf1: 6M lineitem, 50k docs)",
    "scope": ("7 TPC-H headliners + the scale-probe gates (VERDICT r9 ask 6 / r10 ask 2); "
              "r16 adds the text-battery reach (text_quality, text_bigram_lm, corpus_url_parse, "
              "corpus_url_dedup, text_rolling_fp - judge r15 ask #7) and the two heaviest "
              "file-sink-ported replays (stream_interval_replay, stream_session_replay)"),
    "skip_policy": ["dedup_clusters"],
    "notes": ("q1_pricing_summary initially FAILED here in r10 - Spark and DuckDB double-product "
              "sums diverged in the 4th decimal at 6M rows; fixed by exact-integer-cent sums "
              "(also q5/q6/q7/q9/histogram); r11 keeps the exact sums but does the per-row "
              "arithmetic in LONG codegen (q1 sf1 warm 6.79 -> 1.9 s). "
              "dedup_minhash_clusters' oracle is the unrolled propagate+jump walk (8 materialized "
              "rounds, self-auditing sentinel). q_golden_record was VACUOUS at this scale in r10 "
              "(0 rows both engines - the absolute trigram-DF blocking cap zeroed the candidate "
              "set on the replicated lake); r11's scale-relative cap (max(200, n/100), in-plan) "
              "makes the cell real: 16,079 rows, hash-matched."),
}
json.dump(out, sys.stdout, indent=1, sort_keys=True)
print()
