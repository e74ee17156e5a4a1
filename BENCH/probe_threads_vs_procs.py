"""Discriminator probe: is the 32-wide cap per-PROCESS or per-host?

Round-6..8 paradox: 32 concurrent register-bound *subprocesses* scale
nearly cleanly (control overhead 0.04-0.4), yet the single-JVM
local[32] mining leg runs no faster than local[8] (103.7 s vs 105.9 s,
BENCH/probe_32_direct_r8.json) with healthy memory bandwidth.  The two
load shapes differ in exactly one structural way: one schedulable
process with N threads vs N processes with one thread each.  This
probe runs the SAME GIL-releasing kernel (128x128 float64 matmul,
BLAS pinned to one thread, working set ~128 KiB = L2-resident, so no
bandwidth confound) three ways:

  * 1 process x 1 thread          (t1 baseline)
  * N processes x 1 thread each   (the existing control's shape)
  * 1 process x N threads         (the Spark local[N] JVM's shape)

If thread-wide overhead >> process-wide overhead, the hypervisor/host
is capping per-process core delivery — which indicts local[32] itself
and predicts that a multi-JVM layout (Spark ``local-cluster[W,C,M]``)
escapes the cap.  If the two overheads match, the cap is host-global
and the Spark 32-wide flatness needs a different explanation.

Usage: python BENCH/probe_threads_vs_procs.py [N] [--json]
Writes nothing; callers capture stdout (one JSON line).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

# pin BLAS before numpy import so the kernel is single-threaded
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402

#: matmul size and count; ~2-3 s single on this box.  1024x1024 float64
#: DGEMM is ~2.1 GFLOP per call with arithmetic intensity ~170 FLOP/B —
#: compute-bound (no bandwidth confound) and, critically, each call
#: holds a GIL-RELEASED span of ~10-20 ms, so 32 Python threads spend
#: <0.1% of their time contending the GIL (a 128x128 variant measured
#: overhead_threads=8.5 purely from GIL convoying between ~50 us calls
#: — that shape cannot discriminate and was replaced by this one).
DIM = int(os.environ.get("SPARK_GRAFT_TVP_DIM", "1024"))
REPS = int(os.environ.get("SPARK_GRAFT_TVP_REPS", "160"))


def kernel(reps: int = REPS) -> float:
    rng = np.random.default_rng(7)
    a = rng.standard_normal((DIM, DIM))
    b = rng.standard_normal((DIM, DIM))
    out = np.empty_like(a)
    t0 = time.time()
    for _ in range(reps):
        np.matmul(a, b, out=out)
    return time.time() - t0


def procs_wide(n: int) -> list[float]:
    children = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--one"],
            stdout=subprocess.PIPE,
            text=True,
            env=dict(os.environ),
        )
        for _ in range(n)
    ]
    walls = []
    for c in children:
        out, _ = c.communicate()
        walls.append(float(out.strip().splitlines()[-1]))
    return walls


def threads_wide(n: int) -> list[float]:
    walls = [0.0] * n

    def one(i: int) -> None:
        walls[i] = kernel()

    ts = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return walls


def main() -> None:
    if "--one" in sys.argv:
        print(kernel())
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    t1 = kernel()
    pw = procs_wide(n)
    tw = threads_wide(n)
    out = {
        "n": n,
        "reps": REPS,
        "t1_sec": round(t1, 3),
        "procs_mean_sec": round(sum(pw) / n, 3),
        "procs_max_sec": round(max(pw), 3),
        "threads_mean_sec": round(sum(tw) / n, 3),
        "threads_max_sec": round(max(tw), 3),
        "overhead_procs": round(sum(pw) / n / t1 - 1.0, 3),
        "overhead_threads": round(sum(tw) / n / t1 - 1.0, 3),
        "ts": time.time(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
