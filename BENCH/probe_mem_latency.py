"""Discriminator probe: does 32-wide concurrency inflate memory LATENCY?

The third leg of the host forensics (with BENCH/control.py's register
burn and streaming-bandwidth probes, and probe_threads_vs_procs.py's
thread-vs-process shape test).  The mining job's level-3 stage — the
94 of 115 seconds that refuse to scale past 8-wide — is hash-probe and
shuffle-map heavy: dependent random accesses, i.e. bound by memory
LATENCY under concurrency, which neither a register burn (no memory
traffic) nor a streaming probe (prefetchable bandwidth) witnesses.

Kernel: a serial pointer chase over a random cycle permutation of
2^24 int64 slots (128 MiB — far past L3, every step a DRAM miss).
The Python-interpreter component of each step is register-bound work,
which probe_threads_vs_procs.py proves scales cleanly to 32-wide, so
any per-process inflation of the chase wall at 32-wide is the memory
system, not the CPUs.

Usage: python BENCH/probe_mem_latency.py [N]     (one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

#: permutation slots: 2^24 * 8 B = 128 MiB per process
SLOTS = int(os.environ.get("SPARK_GRAFT_LAT_SLOTS", str(1 << 24)))
#: chase steps per sample; ~0.5-1 s single on this box
STEPS = int(os.environ.get("SPARK_GRAFT_LAT_STEPS", "2000000"))


def chase() -> float:
    """Seconds per step (interpreter + one dependent DRAM miss)."""
    rng = np.random.default_rng(11)
    # random cycle: shuffle then link i -> next, guaranteeing full cover
    order = rng.permutation(SLOTS)
    p = np.empty(SLOTS, dtype=np.int64)
    p[order[:-1]] = order[1:]
    p[order[-1]] = order[0]
    i = 0
    t0 = time.time()
    for _ in range(STEPS):
        i = p[i]
    return (time.time() - t0) / STEPS


def wide(n: int) -> list[float]:
    children = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--one"],
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(n)
    ]
    out = []
    for c in children:
        o, _ = c.communicate()
        out.append(float(o.strip().splitlines()[-1]))
    return out


#: best single-process per-miss cost observed on this box (2026-08-19
#: calibration, BENCH/probe_host_latency_r8.json); used by callers as
#: the healthy reference for an N-wide latency gate
BEST_SINGLE_NS = 163.9


def probe(n: int) -> dict:
    """One N-wide latency sample for gating: mean/max ns per miss."""
    w = wide(n)
    return {
        "lat_n": n,
        "lat_wide_mean_ns": round(sum(w) / n * 1e9, 1),
        "lat_wide_max_ns": round(max(w) * 1e9, 1),
    }


def main() -> None:
    if "--one" in sys.argv:
        print(chase())
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    t1 = chase()
    w = wide(n)
    out = {
        "n": n,
        "slots": SLOTS,
        "steps": STEPS,
        "t1_ns_per_step": round(t1 * 1e9, 1),
        "wide_mean_ns": round(sum(w) / n * 1e9, 1),
        "wide_max_ns": round(max(w) * 1e9, 1),
        "latency_inflation": round(sum(w) / n / t1 - 1.0, 3),
        "ts": time.time(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
