"""driver_finish_edges A/B for DBSCAN's connected-components finish: the
sf0.1 dbscan workload run with the contracted-graph driver-finish
threshold at 500k vs 1M int-encoded edges.

Background: commit ca887f2 raised the default to 1M claiming -13% (the
563k-edge ε-graph skips its one distributed contraction round), but the
round-2 → round-3 cross-round bench comparison showed +15% on dbscan —
inside the documented ±10-20% single-machine noise band, so the two
numbers cannot settle it.  This is the within-session, per-leg-subprocess
A/B (same methodology as hll_ab.py: each leg in its own JVM, warmup
inside, best-of-N) that does.

Run:  python BENCH/dbscan_ab.py          # prints one JSON line, saves
                                         # BENCH/dbscan_ab_last.json
      python BENCH/dbscan_ab.py --one 500000|1000000   # single leg
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
      SPARK_GRAFT_CPUS (default 32),
      SPARK_GRAFT_DBSCAN_RUNS (default 2) = runs per leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BENCH_D = 6.0
MIN_PTS = 4


def run_leg(threshold: int) -> dict:
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.cluster import (
        dbscan,
    )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = eng.get_spark(
        f"local[{cpus}]",
        app_name=f"dbscan-ab-{threshold}",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    inst = entrymod.instances_from_events(spark, sf_dir).persist()
    inst.count()

    def leg():
        t0 = time.time()
        n = dbscan(inst, BENCH_D, MIN_PTS, driver_finish_edges=threshold).count()
        return time.time() - t0, n

    leg()  # JIT/codegen warmup inside this JVM
    wall, n = leg()
    spark.stop()
    return {"threshold": threshold, "wall_sec": round(wall, 2), "rows": n}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        print(json.dumps(run_leg(int(sys.argv[2]))))
        return
    reps = int(os.environ.get("SPARK_GRAFT_DBSCAN_RUNS", "2"))
    best: dict[int, dict] = {}
    for threshold in (500_000, 1_000_000):
        for _ in range(reps):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(threshold)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            if out.returncode != 0 or not out.stdout.strip():
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(
                    f"leg {threshold} failed (rc={out.returncode}) — stderr above"
                )
            run = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps(run), flush=True)
            if (
                threshold not in best
                or run["wall_sec"] < best[threshold]["wall_sec"]
            ):
                best[threshold] = run
    lo, hi = best[500_000], best[1_000_000]
    assert lo["rows"] == hi["rows"], "driver-finish threshold changed the output!"
    summary = {
        "metric": "dbscan CC driver-finish threshold: 500k vs 1M int edges",
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "rows": lo["rows"],
        "sec_500k": lo["wall_sec"],
        "sec_1m": hi["wall_sec"],
        "speedup_1m_over_500k": round(lo["wall_sec"] / hi["wall_sec"], 3),
        "runs_per_leg": reps,
    }
    print(json.dumps(summary))
    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dbscan_ab_last.json"
    )
    with open(art, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
