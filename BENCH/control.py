"""Pure-compute host-health control for wave-aware benchmarking.

This sandbox's hypervisor delivers CPU in waves: identical jobs measure
±50% apart across a day (BENCH/BASELINE.md "host stall waves").  Every
scaling/benchmark figure therefore needs an independent witness that
the host was actually delivering cores when the figure was taken.  The
witness is the cheapest thing that cannot be blamed on Spark, the JVM,
the shuffle path, or the disk: N concurrent *processes* of fixed
register-bound integer work.  On a healthy host, per-process wall is
flat up to 8-wide (round-4/5 reference: 8-wide costs +3..10% over
1-wide, from SMT/turbo alone); inside a wave it pays +30..45%.

``control(procs)`` measures single-process and ``procs``-wide walls and
returns the relative overhead; callers gate a measurement window on
``overhead <= tol`` (default 0.12 — above everything a healthy host
shows at 8-wide, below every wave observed).

Children are real subprocesses (not fork of the caller, which may hold
a JVM): this file re-executes itself with ``--burn``.

Run standalone for a one-shot host check:
    python BENCH/control.py [procs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

#: iterations of the register-bound LCG loop; ~2.5 s single-process on
#: this box (calibration constant, not load-bearing — only the RATIO of
#: N-wide to 1-wide per-process wall is interpreted)
BURN_N = 15_000_000

#: max N-wide per-process overhead over 1-wide for a window to count as
#: clean.  Healthy 8-wide reference is +0.03..0.10; waves measure
#: +0.30..0.45.  Overridable via $SPARK_GRAFT_CTL_TOL.
CLEAN_TOL = float(os.environ.get("SPARK_GRAFT_CTL_TOL", "0.12"))

#: best healthy single-process wall for BURN_N on this box (calibrated
#: 2026-08-17; repeated healthy samples land 2.45-2.85 s).  The RELATIVE
#: overhead alone is not a sufficient clean test: a wave that inflates
#: the single-process sample itself (observed: t1 jumping 2.47 -> 5.99 s
#: minutes apart) can make wide/t1 read *negative* while the host is
#: delivering half speed — so a window is clean only if the ABSOLUTE
#: walls are also near the healthy reference.
T1_REF = float(os.environ.get("SPARK_GRAFT_CTL_T1_REF", "2.45"))

#: max absolute slowdown of any control wall over T1_REF for a clean
#: window.  Healthy spread reaches ~+16% on t1 and ~+20% on the wide
#: mean (SMT/turbo); observed waves sit at +30..+145%.
ABS_TOL = float(os.environ.get("SPARK_GRAFT_CTL_ABS_TOL", "0.25"))

#: healthy single-process streaming-read bandwidth on this box
#: (round-6 measurement: 9.8 GB/s per process at 1, 2 and 8 procs,
#: 73 GB/s aggregate at 8).  The register-bound burn CANNOT witness a
#: bandwidth-starved window: round 7 observed legs 20-53% over their
#: steady floors between two fully-clean burn controls while a numpy
#: streaming probe measured 2.0-4.9 GB/s — the hypervisor was
#: withholding memory bandwidth, not cycles, and memory-heavy Spark
#: stages starve while pure-register work runs at full speed.  A
#: window is clean only if streaming bandwidth is also near healthy.
BW_REF = float(os.environ.get("SPARK_GRAFT_CTL_BW_REF", "9.8"))

#: healthy AGGREGATE streaming bandwidth at N concurrent processes:
#: per-process rate holds at ~9.8 GB/s through at least 8-wide
#: (round-6 control: 73 GB/s aggregate at 8; a round-7 32-proc sample
#: measured 191.6 GB/s aggregate, so 73 is the healthy 8-proc DRAW,
#: not a socket ceiling — the min() below simply caps the reference at
#: the widest draw that has been calibrated).  The aggregate is what
#: an N-wide Spark stage actually competes for — round-7 measured
#: 1-proc 7.5 GB/s (looks near-healthy) while the 8-proc aggregate was
#: 37.8 GB/s (0.52x the healthy draw), exactly when 8-wide legs ran
#: +45-53% over floor and 2-wide legs only +20%.
BW_AGG_CEIL = float(os.environ.get("SPARK_GRAFT_CTL_BW_CEIL", "73.0"))

#: min fraction of the healthy aggregate for a clean window.  Healthy
#: samples sit at 0.9-1.05x; the round-7 starved state measured ~0.5x.
BW_MIN_FRAC = float(os.environ.get("SPARK_GRAFT_CTL_BW_FRAC", "0.6"))


def stream_bw(n: int = 75_000_000, passes: int = 2) -> float:
    """Single-process streaming-read bandwidth (GB/s), best of
    ``passes`` samples — a wave can only *lower* a sample, so the max
    is the host's currently-deliverable capacity."""
    import numpy as np

    a = np.ones(n)
    best = 0.0
    for _ in range(passes):
        t0 = time.time()
        s = 0.0
        for _ in range(3):
            s += a.sum()
        best = max(best, 3 * n * 8 / (time.time() - t0) / 1e9)
    return best


def _bw_ref(procs: int) -> float:
    """Healthy aggregate bandwidth at ``procs`` concurrent streamers."""
    return min(procs * BW_REF, BW_AGG_CEIL)


def _spawn_bw(procs: int) -> list[float]:
    """``procs`` concurrent subprocess streaming probes; per-child GB/s."""
    children = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--bwone"],
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(procs)
    ]
    rates = []
    for c in children:
        out, _ = c.communicate()
        rates.append(float(out.strip().splitlines()[-1]))
    return rates


def burn(n: int = BURN_N) -> float:
    """The witness workload: fixed register-bound integer work.

    No memory traffic, no syscalls inside the loop — its wall moves
    only when the hypervisor withholds cycles."""
    t0 = time.time()
    x = 1
    for _ in range(n):
        x = (x * 1103515245 + 12345) % 2147483648
    return time.time() - t0


def _spawn_burns(procs: int, n: int) -> list[float]:
    """``procs`` concurrent subprocess burns; per-child walls.

    Per-child walls (not the envelope) so process-spawn stagger does not
    read as host slowness."""
    children = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--burn", str(n)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(procs)
    ]
    walls = []
    for c in children:
        out, _ = c.communicate()
        walls.append(float(out.strip().splitlines()[-1]))
    return walls


def control(procs: int = 8, n: int = BURN_N, tol: float | None = None) -> dict:
    """One control sample: 1-wide wall, ``procs``-wide mean/max walls,
    relative overhead, and the clean verdict at ``tol``."""
    if tol is None:
        tol = CLEAN_TOL
    t1 = min(_spawn_burns(1, n))  # single child: its wall IS the min
    wide = _spawn_burns(procs, n)
    mean_w = sum(wide) / len(wide)
    overhead = mean_w / t1 - 1.0
    # scaled reference: BURN_N overrides keep the absolute check valid
    t1_ref = T1_REF * (n / BURN_N)
    abs_slow = max(t1, mean_w) / t1_ref - 1.0
    bw_each = _spawn_bw(procs)
    bw_agg = sum(bw_each)
    bw_ok = bw_agg >= BW_MIN_FRAC * _bw_ref(procs)
    return {
        "procs": procs,
        "t1_sec": round(t1, 3),
        "wide_mean_sec": round(mean_w, 3),
        "wide_max_sec": round(max(wide), 3),
        "overhead": round(overhead, 3),
        "abs_slowdown": round(abs_slow, 3),
        "bw_agg_GBps": round(bw_agg, 1),
        "bw_ref_GBps": round(_bw_ref(procs), 1),
        "bw_ok": bw_ok,
        "tol": tol,
        "abs_tol": ABS_TOL,
        # all three must pass: relative (the wide work gets full
        # per-core speed), absolute (the host is at healthy speed at
        # all — a wave can inflate t1 and mask itself in the ratio),
        # and bandwidth (a starved memory bus slows Spark 20-50% while
        # register-bound burns read clean — see BW_REF note)
        "clean": overhead <= tol and abs_slow <= ABS_TOL and bw_ok,
        "ts": round(time.time(), 1),
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--burn":
        print(burn(int(sys.argv[2])))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--bwone":
        print(stream_bw())
        return
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(control(procs)))


if __name__ == "__main__":
    main()
