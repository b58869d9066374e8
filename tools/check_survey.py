#!/usr/bin/env python3
"""Coverage-contract lint: every gate registered in SparkEntry.queries
(every QueryDef.sql/rowsOnly name in src/main) must appear in SURVEY.md,
and every backticked gate-shaped checklist token in SURVEY §2 must be a
registered gate (catches both stale-contract directions — VERDICT r10
found 6 shipped gates with no checklist line).

Exit 0 = contract in sync. Run from the repo root.
"""
import re, subprocess, sys

src = subprocess.run(
    ["grep", "-rhoE", r'QueryDef\.(sql|rowsOnly)\("[a-z0-9_]+"', "src/main/scala"],
    capture_output=True, text=True).stdout
gates = sorted(set(re.findall(r'"([a-z0-9_]+)"', src)))

survey = open("SURVEY.md").read()
sec2 = survey.split("## §3")[0]
# forward direction: every registered gate needs a CHECKLIST LINE in
# §2 itself (r12 verdict: two green gates were named only in round-
# results prose — "anywhere in the file" is not an inventory)
missing = [g for g in gates
           if not re.search(rf"^- \[x\] `{re.escape(g)}`", sec2, re.M)]

# reverse direction: backticked tokens in §2 that LOOK like gates
# (known family prefixes) but are not registered
prefixes = ("q_", "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9",
            "etl_", "dedup_", "ann_", "emb_", "text_", "corpus_", "mm_",
            "stream_", "ts_", "pipeline_")
claimed = set(t for t in re.findall(r"`([a-z0-9_]+)`", sec2)
              if t.startswith(prefixes) and not t.endswith("_"))
# non-gate identifiers legitimately backticked in §2 prose
allow = {"stream_session_state"}
phantom = sorted(t for t in claimed - set(gates) - allow)

ok = True
if missing:
    ok = False
    print(f"GATES WITHOUT A SURVEY LINE ({len(missing)}):")
    for g in missing:
        print(f"  {g}")
if phantom:
    ok = False
    print(f"SURVEY §2 TOKENS NOT REGISTERED AS GATES ({len(phantom)}):")
    for g in phantom:
        print(f"  {g}")
print(f"registered gates: {len(gates)}; survey-missing: {len(missing)}; "
      f"phantom: {len(phantom)}")
sys.exit(0 if ok else 1)
