#!/usr/bin/env python
"""Cheap (~7 s) host-phase health probe for self-certifying benchmarks.

The sandbox host has multi-HOUR degradation phases (identical 300k-doc
jobs measured 38.6 s and 234 s forty minutes apart — r4
BENCH_SCALING.json method note).  Every scaling measurement must
therefore carry evidence of the phase it ran in.  This probe measures,
against the healthy-host reference committed in HOST_EVIDENCE.json:

  cpu1   single-process pure-CPU rate   (healthy ~123 loops/s)
  bw1    single-process memcpy GB/s     (healthy ~15.2)
  bw8    8-process aggregate memcpy GB/s (healthy ~86.6)

A reading is HEALTHY when all three are >= HEALTHY_FRAC of reference.
The ER job is string/memory-heavy, so bw8 is the signal that tracks its
degradation; cpu1 catches steal/stall phases.

Library: ``reading() -> dict``; CLI prints the dict as one JSON line and
exits 0 iff healthy.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

# healthy-host reference values from HOST_EVIDENCE.json (r3, idle host)
REF = {"cpu1": 123.1, "bw1": 15.2, "bw8": 86.6}
HEALTHY_FRAC = 0.75


def _cpu_burn(dur: float) -> int:
    x, n = 0, 0
    t_end = time.time() + dur
    while time.time() < t_end:
        for i in range(100000):
            x += i * i % 7
        n += 1
    return n


def _bw_burn(dur: float) -> int:
    buf = np.frombuffer(
        np.random.RandomState(0).bytes(64 * 1024 * 1024), dtype=np.uint8
    ).copy()
    out = np.empty_like(buf)
    n = 0
    t_end = time.time() + dur
    while time.time() < t_end:
        np.copyto(out, buf)  # 64 MiB read + 64 MiB write
        buf[::4096] += 1
        n += 1
    return n


def _str_burn(dur: float) -> int:
    """String/allocator-heavy loop — the workload class whose multi-core
    CPU amplification tracks the ER job's (memcpy bandwidth alone does
    not: r5 observed healthy bw8 alongside 2x-elevated executor CPU)."""
    import hashlib
    n = 0
    base = "The quick brown fox 實體鏈接 分块去重 " * 8 + "%d"
    t_end = time.time() + dur
    while time.time() < t_end:
        s = base % n
        t = s.upper().lower()
        parts = t.split("重")
        t = "|".join(parts)
        hashlib.md5(t.encode()).hexdigest()
        n += 1
    return n


def reading(cpu_dur: float = 2.0, bw_dur: float = 2.0) -> dict:
    t0 = time.time()
    cpu1 = _cpu_burn(cpu_dur) / cpu_dur
    bw1 = _bw_burn(bw_dur) * 0.125 / bw_dur
    with mp.Pool(8) as p:
        agg = sum(p.map(_bw_burn, [bw_dur] * 8))
    bw8 = agg * 0.125 / bw_dur
    # direct 1->8-proc amplification probe: per-proc string-workload rate
    # at 8 concurrent procs vs solo.  amp8 = solo_rate / per_proc_rate_8;
    # 1.0 = no contention.  The r3-day host measured ~x2.2 on the ER job,
    # degraded phases x3.6+ — this is the phase signal that PREDICTS
    # scaling efficiency, where memcpy bandwidth proved insufficient.
    str1 = _str_burn(cpu_dur) / cpu_dur
    with mp.Pool(8) as p:
        agg = sum(p.map(_str_burn, [cpu_dur] * 8))
    str8_per_proc = agg / 8 / cpu_dur
    amp8 = str1 / str8_per_proc if str8_per_proc else float("inf")
    rec = {
        "ts": round(t0, 1),
        "cpu1": round(cpu1, 1),
        "bw1": round(bw1, 1),
        "bw8": round(bw8, 1),
        "str1_per_s": round(str1, 0),
        "str8_amp": round(amp8, 2),
        "frac_of_ref": {
            k: round(v / REF[k], 2)
            for k, v in (("cpu1", cpu1), ("bw1", bw1), ("bw8", bw8))
        },
    }
    rec["healthy"] = (
        all(f >= HEALTHY_FRAC for f in rec["frac_of_ref"].values())
        and amp8 <= 2.0
    )
    return rec


if __name__ == "__main__":
    r = reading()
    print(json.dumps(r))
    sys.exit(0 if r["healthy"] else 1)
