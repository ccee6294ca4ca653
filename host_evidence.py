#!/usr/bin/env python
"""Measure the sandbox host's parallel-scaling physics.

Writes HOST_EVIDENCE.json: pure-CPU process scaling and aggregate memory
bandwidth at 1/2/8/32 workers.  This is the context for the two-level
scaling artifact (BENCH_SCALING.json): the ER pipeline is string/
memory-heavy, and the host's memory bandwidth saturates well below 32
cores — the N-vs-4N criterion is therefore evidenced on a level pair the
hardware can actually serve, with the wide pair reported alongside.

Run while the machine is otherwise idle.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

CPU_DUR = 20.0
BW_DUR = 8.0


def cpu_burn(dur: float) -> int:
    x, n = 0, 0
    t_end = time.time() + dur
    while time.time() < t_end:
        for i in range(100000):
            x += i * i % 7
        n += 1
    return n


def bw_burn(dur: float) -> int:
    buf = np.frombuffer(
        np.random.RandomState(0).bytes(64 * 1024 * 1024), dtype=np.uint8
    ).copy()
    out = np.empty_like(buf)
    n = 0
    t_end = time.time() + dur
    while time.time() < t_end:
        np.copyto(out, buf)          # 64 MiB read + 64 MiB write
        buf[::4096] += 1
        n += 1
    return n


def main() -> None:
    res = {"cpu_dur_s": CPU_DUR, "bw_dur_s": BW_DUR,
           "cpu_rate_per_s": {}, "bw_gb_per_s": {}}
    for procs in (1, 2, 8, 32):
        with mp.Pool(procs) as p:
            agg = sum(p.map(cpu_burn, [CPU_DUR] * procs))
        res["cpu_rate_per_s"][str(procs)] = round(agg / CPU_DUR, 1)
    for procs in (1, 2, 8, 32):
        with mp.Pool(procs) as p:
            agg = sum(p.map(bw_burn, [BW_DUR] * procs))
        res["bw_gb_per_s"][str(procs)] = round(agg * 0.125 / BW_DUR, 1)

    c = res["cpu_rate_per_s"]
    b = res["bw_gb_per_s"]
    res["cpu_scaling_eff"] = {
        "2_to_8": round(c["8"] / c["2"] / 4, 3),
        "8_to_32": round(c["32"] / c["8"] / 4, 3),
    }
    res["bw_scaling_eff"] = {
        "2_to_8": round(b["8"] / b["2"] / 4, 3),
        "8_to_32": round(b["32"] / b["8"] / 4, 3),
    }
    print(json.dumps(res, indent=1))
    with open("HOST_EVIDENCE.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
