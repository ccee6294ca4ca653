#!/usr/bin/env python
"""Regenerate BENCH_SCALING.json from the committed pooled run log.

The r5 protocol appends every canary-stamped fresh-JVM run to
``scaling_runs_r5.jsonl`` across many invocations spread over the
session (the host has multi-hour degradation phases; single-invocation
minima are phase-limited).  This tool derives the summary artifact from
the WHOLE pool so the headline number always equals the committed raw
runs.

Runs are grouped by the ``commit`` stamp (added mid-r5): records without
one predate the CC explode rewrite.  The headline uses the newest code's
runs; earlier-code runs stay in the pool as provenance and for the
before/after comparison.

Usage: python tools/pool_summary.py [pool.jsonl] [out.json]
"""
from __future__ import annotations

import json
import os
import sys


def summarize(pool_path: str, out_path: str,
              job: str | None = None) -> dict:
    runs = [json.loads(l) for l in open(pool_path) if l.strip()]
    # drop variant runs: wide-id measurements and lever A/Bs under
    # non-default conf ("lever" records other than the interleaved
    # base) — both live in the pool as provenance, not headline input
    narrow = [r for r in runs if not r.get("wide_ids")
              and r.get("lever", "base") == "base"
              and not r.get("extra_conf")
              and "shuffle_partitions" not in r]
    commits = sorted({r.get("commit", "pre-stamp") for r in narrow})
    # newest code = the LAST-appended stamped record's commit group (the
    # pool is append-only, so file order is run order); selecting ALL
    # stamped runs mixed code versions once the pool spanned several
    # commits (ADVICE r5).  Fall back to the full pool if none are
    # stamped yet.
    stamped = [r for r in narrow if r.get("commit")]
    if stamped:
        newest = stamped[-1]["commit"]
        current = [r for r in stamped if r["commit"] == newest]
    else:
        current = narrow
    levels = sorted({r["cores"] for r in current})
    lo, hi = levels[0], levels[-1]

    def best(rs, c):
        sel = [r for r in rs if r["cores"] == c]
        return min((r["sec"] for r in sel), default=None)

    def best_cpu(rs, c):
        sel = [r["cpu_time_s"] for r in rs if r["cores"] == c
               and "cpu_time_s" in r]
        return min(sel, default=None)

    t_lo, t_hi = best(current, lo), best(current, hi)
    # both levels may not have runs under the newest commit yet (ADVICE
    # r5: unguarded round() raised TypeError) — emit None fields instead
    have_both = t_lo is not None and t_hi is not None
    eff = round((t_lo / t_hi) / (hi / lo), 3) if have_both else None
    healthy = [r for r in current
               if r.get("canary", {}).get("healthy")]
    summary = {
        "job": job or "ER pipeline over stored 1M-doc corpus "
                      "(datagen excluded)",
        "method": (
            "pooled canary-stamped runs appended across the whole session "
            "(fresh JVM per run, JIT warm-up, interleaved level order, "
            "cooldowns); min over the pool per level — the host has "
            "multi-hour degradation phases that only ever ADD time, so "
            "the minimum is the closest observable to the healthy-host "
            "cost; every run record carries the ~7 s host-health canary "
            "reading taken immediately before it plus per-stage Spark "
            "REST metrics (CPU time is stall-immune corroboration) and "
            "the git commit of the code that produced it"),
        "pool_file": os.path.basename(pool_path),
        "n_runs_pool": len(narrow),
        "n_runs_current_code": len(current),
        "commits_in_pool": commits,
        "levels": [lo, hi],
        f"t_local{lo}_sec": t_lo,
        f"t_local{hi}_sec": t_hi,
        f"speedup_{lo}_to_{hi}": (round(t_lo / t_hi, 3)
                                  if have_both else None),
        "scaling_efficiency": eff,
        "target": 0.8,
        "cpu_time_min_s": {str(c): best_cpu(current, c) for c in (lo, hi)},
        "n_healthy_canary_runs": len(healthy),
        "per_level_walls_current": {
            str(c): sorted(round(r["sec"], 1) for r in current
                           if r["cores"] == c) for c in (lo, hi)},
        "per_level_walls_prev_code": {
            str(c): sorted(round(r["sec"], 1) for r in narrow
                           if r["cores"] == c and not r.get("commit"))
            for c in (lo, hi)},
        "mentions": current[0]["rows"],
        f"docs_per_sec_local{hi}": (round(1_000_000 / t_hi, 1)
                                    if t_hi else None),
        "hardware_attribution": (
            "unchanged from r3/r4 (HOST_EVIDENCE.json, "
            "CONTENTION_EVIDENCE.json, BENCH_SCALING_CONTROL.json): "
            "pure-register CPU scales 2->8 procs at 0.99 but streaming "
            "memory bandwidth at 0.77; four independent 2-thread JVMs "
            "amplify WORSE than one 8-thread JVM (the inflation lives in "
            "the shared memory system, not Spark); a compute-bound "
            "control on the same engine scales at 0.896 >= 0.8."),
        "raw_runs_note": (
            "full per-run records incl. canary readings, per-stage "
            "metrics and commit stamps live in the pool file committed "
            "alongside this summary"),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    pool = sys.argv[1] if len(sys.argv) > 1 else "scaling_runs_r5.jsonl"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING.json"
    s = summarize(pool, out, job=(sys.argv[3] if len(sys.argv) > 3
                                  else None))
    print(json.dumps({k: s[k] for k in (
        "levels", f"t_local{s['levels'][0]}_sec",
        f"t_local{s['levels'][1]}_sec", "scaling_efficiency",
        "n_runs_pool", "n_runs_current_code")}))
