"""Reference-dataset headline walls, re-measured on the CURRENT code.

BENCH/BASELINE.md's reference-parity table quotes LasVegas / 5k_15f_50k
walls; this script is the reproducible measurement behind those rows so
each round can refresh them instead of carrying stale numbers forward.

Method (labeled in the artifact): one subprocess JVM per (dataset, plan)
leg at local[8] (the configuration the table quotes), wall = CSV load +
full mine, measured twice in the same JVM — `first` is the cold
user-visible wall (JIT/codegen included), `steady` the warm repeat.
Output parity is asserted against the exact goldens before any number is
recorded.

Run:  python BENCH/goldens_bench.py      # prints JSON lines, saves
                                         # BENCH/goldens_last.json
      python BENCH/goldens_bench.py --one <name> <plan>   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DATASETS = {
    "LasVegas": {
        "csv": "/root/reference/data/LasVegas_x_y_alphabet_version_03_2.csv",
        "d": 160.0,
        "min_prev": 0.15,
        "pairs": 182_738,
        "patterns": 513,
    },
    "5k_15f_50k": {
        "csv": "/root/reference/data/5k_15f_50k.csv",
        "d": 12.0,
        "min_prev": 0.2,
        "pairs": 76_006,
        "patterns": 48,
    },
}


def run_leg(name: str, plan: str) -> dict:
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.csv_source import (
        load_instances_csv,
    )

    cfgd = DATASETS[name]
    spark = eng.get_spark(
        "local[8]",
        app_name=f"goldens-{name}-{plan}",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16")),
        extra_conf={"spark.driver.extraJavaOptions": "-XX:ActiveProcessorCount=8"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def once() -> tuple[float, object]:
        t0 = time.time()
        inst = load_instances_csv(spark, cfgd["csv"])
        miner = eng.ColocationMiner(
            spark, eng.ColocationConfig(cfgd["d"], cfgd["min_prev"])
        )
        res = miner.mine_subtrees(inst) if plan == "subtree" else miner.mine(inst)
        return time.time() - t0, res

    first_wall, res = once()
    assert res.pair_count == cfgd["pairs"], (name, res.pair_count)
    assert len(res.patterns) == cfgd["patterns"], (name, len(res.patterns))
    steady_wall, res2 = once()
    assert len(res2.patterns) == cfgd["patterns"]
    spark.stop()
    return {
        "dataset": name,
        "plan": plan,
        "first_sec": round(first_wall, 2),
        "steady_sec": round(steady_wall, 2),
        "pairs": cfgd["pairs"],
        "patterns": cfgd["patterns"],
    }


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        print(json.dumps(run_leg(sys.argv[2], sys.argv[3])))
        return
    results = []
    for name in DATASETS:
        for plan in ("levelwise", "subtree"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name, plan],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            if out.returncode != 0 or not out.stdout.strip():
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(f"{name}/{plan} failed (rc={out.returncode})")
            run = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps(run), flush=True)
            results.append(run)
    summary = {
        "metric": "reference-dataset mining walls, local[8], load+mine",
        "method": "one JVM per leg; first = cold in-JVM wall, steady = warm repeat",
        "legs": results,
    }
    print(json.dumps(summary))
    art = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "goldens_last.json"
    )
    with open(art, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
