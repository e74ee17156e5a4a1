"""8->32 wall probe at a ~5x working set (VERDICT r04 #6c).

Question: round 2-4 measured 8->32 scaling efficiency ~0.55-0.62 on the
2M-instance workload and attributed it to the single-socket memory
bandwidth wall (all config alternatives falsified, BENCH/probe_8_32.json).
If that explanation is right, a working set several times larger than LLC
should NOT soften the wall (bandwidth per byte is unchanged); if the wall
were instead fixed-overhead amortization, a bigger job would improve it.

Workload: REP=100 replicas of the sf0.1 events table = 10M instances,
d = 1/sqrt(5) so the expected neighbor degree stays at the 2M workload's
~10 (degree ~ n*d^2) — same per-row shape, ~5x rows and pairs.

Runs each leg once via BENCH/scaling.py --one (pure evidence probe; the
north-rule artifact stays the best-of-2 2->8 measurement) and writes
BENCH/probe_10m_8_32.json WITHOUT touching scaling_last*.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    env = dict(
        os.environ,
        SPARK_GRAFT_SCALE_REP="100",
        SPARK_GRAFT_SCALE_D=str(1.0 / math.sqrt(5.0)),
        SPARK_GRAFT_DRIVER_MEM="48g",
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
        "metric": "8->32 wall probe at 5x working set (10M inst, degree-matched d)",
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
    with open(os.path.join(BENCH_DIR, "probe_10m_8_32.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
