"""Opportunistic 8->32 re-measurement watcher.

The 8->32 scaling leg has been unmeasurable since round 6: the
hypervisor delivers ~24 effective cores, so any 32-wide work pays
+35-50% and t32 can exceed t8 (BENCH/scaling_last_8_32.json documents
the non-measurement with its same-hour controls).  This watcher probes
the 32-wide control on a timer and fires the full wave-aware campaign
(BENCH/scaling.py, SPARK_GRAFT_SCALE_LO=8 HI=32) the moment a clean
window appears — the only honest way to re-land that figure.

Run:  python BENCH/watch_8_32.py [hours]      # default 3
Probes append to BENCH/watch_8_32_probes.jsonl either way, so even a
fruitless watch leaves evidence of how often the cap was checked.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from control import control  # noqa: E402

PROBE_EVERY = float(os.environ.get("SPARK_GRAFT_WATCH_EVERY", "600"))
PAUSE_FILE = os.environ.get("SPARK_GRAFT_SCALE_PAUSE", "/tmp/scaling_pause")


def main() -> None:
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    deadline = time.time() + hours * 3600
    bench_dir = os.path.dirname(os.path.abspath(__file__))
    log = os.path.join(bench_dir, "watch_8_32_probes.jsonl")
    while time.time() < deadline:
        while os.path.exists(PAUSE_FILE) and time.time() < deadline:
            time.sleep(30)
        if time.time() >= deadline:
            break
        c = control(32)
        with open(log, "a") as f:
            f.write(json.dumps(c) + "\n")
        print(json.dumps(c), flush=True)
        if c["clean"]:
            print("clean 32-wide window — launching 8->32 campaign", flush=True)
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALE_LO="8",
                SPARK_GRAFT_SCALE_HI="32",
                SPARK_GRAFT_SCALE_RUNS="2",
                SPARK_GRAFT_SCALE_ATTEMPTS="10",
                SPARK_GRAFT_SCALE_SLEEP="60",
                # this leg's healthy ceiling is 0.56-0.62 (bandwidth
                # wall); 0.5 is the round-4-level "valid figure" bar
                SPARK_GRAFT_SCALE_TARGET="0.5",
            )
            subprocess.run(
                [sys.executable, os.path.join(bench_dir, "scaling.py")],
                env=env,
                timeout=7200,
            )
            return
        time.sleep(PROBE_EVERY)
    print("watch expired with no clean 32-wide window", flush=True)


if __name__ == "__main__":
    main()
