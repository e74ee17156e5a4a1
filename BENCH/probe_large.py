"""8->32 wall probe at the largest working set this sandbox can host
(VERDICT r04 #6c; 1.5x the baseline — the 2.5x and 5x attempts died on
scratch capacity, see below).

Question: round 2-4 measured 8->32 scaling efficiency ~0.55-0.62 on the
2M-instance workload and attributed it to the single-socket memory
bandwidth wall (all config alternatives falsified, BENCH/probe_8_32.json).
If that explanation is right, a working set several times larger than LLC
should NOT soften the wall (bandwidth per byte is unchanged); if the wall
were instead fixed-overhead amortization, a bigger job would improve it.

Workload: REP=30 replicas of the sf0.1 events table = 3M instances,
d = 1/sqrt(1.5) so the expected neighbor degree stays at the 2M
workload's ~10 (degree ~ n*d^2) — same per-row shape, ~1.5x rows and
pairs.  3M is the LARGEST this sandbox can host: a REP=100/10M attempt
was OOM-killed (the default spark.local.dir is tmpfs — /dev/shm —
so shuffle+spill bytes count against the same 128 GiB as the JVM heap),
and a REP=50/5M attempt on a disk-backed local dir filled the 62 GB of
free scratch mid-level-3 (No space left on device).  This probe keeps
the disk-backed local dir — slower shuffle I/O than tmpfs, but
identical at both parallelism levels, so the efficiency RATIO stays
valid, and disk-backed shuffle is the shape a real cluster has anyway.

Runs each leg once via BENCH/scaling.py --one (pure evidence probe; the
north-rule artifact stays the best-of-2 2->8 measurement) and writes
BENCH/probe_3m_8_32.json WITHOUT touching scaling_last*.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    local_dir = "/tmp/spark-probe-large"
    os.makedirs(local_dir, exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_SCALE_REP="30",
        SPARK_GRAFT_SCALE_D=str(1.0 / math.sqrt(1.5)),
        SPARK_GRAFT_DRIVER_MEM="64g",
        SPARK_GRAFT_LOCAL_DIR=local_dir,
    )
    legs = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.join(BENCH_DIR, "scaling.py"), "--one", str(cpus)],
            capture_output=True,
            text=True,
            env=env,
            timeout=5400,
        )
        if out.returncode != 0:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"leg {cpus} failed rc={out.returncode}")
        run = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(run), flush=True)
        legs[cpus] = run
    eff = (legs[8]["wall_sec"] / legs[32]["wall_sec"]) / 4.0
    summary = {
        "metric": "8->32 wall probe at 1.5x working set (3M inst, degree-matched d, disk-backed local dir)",
        "t8_sec": legs[8]["wall_sec"],
        "t32_sec": legs[32]["wall_sec"],
        "rows_per_sec_8": legs[8]["rows_per_sec"],
        "rows_per_sec_32": legs[32]["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_instances": legs[32]["n_instances"],
        "pairs": legs[32]["pairs"],
        "reference_2m_efficiency": "0.56-0.62 (BENCH/scaling_last_8_32.json, probe_8_32.json)",
        "legs": legs,
    }
    print(json.dumps(summary))
    with open(os.path.join(BENCH_DIR, "probe_3m_8_32.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
