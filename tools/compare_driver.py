#!/usr/bin/env python3
"""Per-gate hard-timeout wrapper around compare.py for large-SF sweeps.

DuckDB's interrupt() cannot stop every operator mid-flight (a single
quadratic join can grind for hours ignoring it), so each gate runs in
its OWN subprocess killed at the deadline. Output: one status line per
gate (OK / CHECK / ORACLE-HARD-TIMEOUT / ...), then a summary with the
timeout list — the declared-quadratic exclusion candidates.

Usage: compare_driver.py <verify_out_dir> <sf_dir> [timeout_s] [jobs]
"""
import json, os, subprocess, sys
from concurrent.futures import ThreadPoolExecutor

out = sys.argv[1]
sfdir = sys.argv[2]
timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
jobs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
skip = set(x for x in os.environ.get("COMPARE_SKIP", "").split(",") if x)

gates = sorted(n for n in os.listdir(out) if n != "oracle_sql.json")
here = os.path.dirname(os.path.abspath(__file__))

def run(gate):
    # skip-listed gates still go through compare.py, whose SKIP branch
    # does the rows>0 check (a 0-row dump must fail even under policy)
    env = dict(os.environ, COMPARE_ONLY=gate)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "compare.py"), out, sfdir],
            env=env, capture_output=True, text=True, timeout=timeout_s)
        lines = [l for l in p.stdout.splitlines() if not l.startswith("FAILS:")]
        body = "\n".join(lines) if lines else f"NO-OUTPUT {gate} rc={p.returncode}"
        return gate, body, p.returncode == 0
    except subprocess.TimeoutExpired:
        return gate, f"ORACLE-HARD-TIMEOUT {gate} (> {timeout_s:.0f}s)", None

results = []
with ThreadPoolExecutor(max_workers=jobs) as ex:
    for gate, body, ok in ex.map(run, gates):
        print(body, flush=True)
        results.append((gate, ok))

timeouts = [g for g, ok in results if ok is None]
fails = [g for g, ok in results if ok is False]
print("TIMEOUTS:", len(timeouts), ",".join(timeouts))
print("FAILS:", len(fails), ",".join(fails))

# machine-readable record (COMPARE_JSON_OUT=path): the per-gate status
# map that becomes the round's large-SF parity artifact
json_out = os.environ.get("COMPARE_JSON_OUT")
if json_out:
    status = {}
    for gate, ok in results:
        status[gate] = ("oracle-hard-timeout" if ok is None
                        else "fail" if ok is False
                        else "skip-quadratic-oracle-rows-only" if gate in skip
                        else "ok")
    rec = {
        "sf_dir": sfdir,
        "timeout_s": timeout_s,
        "skip_policy": sorted(skip),
        "n_gates": len(results),
        "n_ok": sum(1 for g, ok in results if ok is True and g not in skip),
        "n_skip": sum(1 for g, _ in results if g in skip),
        "n_timeout": len(timeouts),
        "n_fail": len(fails),
        "gates": status,
    }
    with open(json_out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print("WROTE", json_out)
sys.exit(1 if fails else 0)
