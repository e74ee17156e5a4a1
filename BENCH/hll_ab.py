"""approx_rsd (HyperLogLog++ participation) A/B at scale: the 2M-instance
scaling workload mined with exact countDistinct vs approx_count_distinct
(rsd=0.01) — quantifying the distinct-shuffle saving of the heaviest
aggregate in the plan (plans/miner.py::_ndistinct) and the pattern-flip
rate near the prevalence threshold.

Methodology mirrors scaling.py: each leg runs in its OWN subprocess/JVM
(an in-process A/B turned out to be order-biased: the third consecutive
2M mine in one JVM paid accumulating heap/GC pressure, flipping the
result between runs), best-of-N per leg, warmup inside each JVM.

Run:  python BENCH/hll_ab.py            # prints one JSON line, saves
                                        # BENCH/hll_last.json
      python BENCH/hll_ab.py --one exact|hll   # single leg (internal)
Env:  SPARK_GRAFT_SCALE_REP / _D / _MAXK reuse scaling.py's knobs;
      SPARK_GRAFT_HLL_RUNS (default 2) = runs per leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from BENCH.scaling import D, MAX_K, MIN_PREV, REP, build_instances  # noqa: E402


def run_leg(mode: str) -> dict:
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng

    rsd = 0.01 if mode == "hll" else None
    spark = eng.get_spark(
        "local[32]",
        app_name=f"hll-ab-{mode}",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    inst = build_instances(spark, REP).persist()
    inst.count()

    def mine():
        t0 = time.time()
        res = eng.ColocationMiner(
            spark,
            eng.ColocationConfig(
                D,
                MIN_PREV,
                max_pattern_size=MAX_K,
                salt_threshold=None,
                approx_rsd=rsd,
            ),
        ).mine_subtrees(inst)
        return time.time() - t0, res

    mine()  # JIT/codegen warmup inside this JVM
    wall, res = mine()
    out = {
        "mode": mode,
        "wall_sec": round(wall, 2),
        "pairs": res.pair_count,
        "patterns": sorted(",".join(p) for p in res.patterns),
        "wpi": {",".join(p): v for p, v in res.wpi.items()},
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        print(json.dumps(run_leg(sys.argv[2])))
        return
    reps = int(os.environ.get("SPARK_GRAFT_HLL_RUNS", "2"))
    best: dict[str, dict] = {}
    for mode in ("exact", "hll"):
        for _ in range(reps):
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", mode],
                capture_output=True,
                text=True,
                env=env,
                timeout=1800,
            )
            if out.returncode != 0 or not out.stdout.strip():
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(
                    f"{mode} leg failed (rc={out.returncode}) — stderr above"
                )
            run = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps({k: run[k] for k in ("mode", "wall_sec", "pairs")}), flush=True)
            if mode not in best or run["wall_sec"] < best[mode]["wall_sec"]:
                best[mode] = run
    exact, hll = best["exact"], best["hll"]
    exact_set, hll_set = set(exact["patterns"]), set(hll["patterns"])
    flips = sorted(exact_set ^ hll_set)
    wpi_err = max(
        (
            abs(exact["wpi"][p] - hll["wpi"][p])
            for p in exact_set & hll_set
        ),
        default=None,
    )
    summary = {
        "metric": "miner participation agg: exact countDistinct vs HLL rsd=0.01",
        "n_instances": 2_000_000 // 20 * REP,
        "pairs": exact["pairs"],
        "exact_sec": exact["wall_sec"],
        "hll_sec": hll["wall_sec"],
        "speedup": round(exact["wall_sec"] / hll["wall_sec"], 3),
        "patterns_exact": len(exact_set),
        "patterns_hll": len(hll_set),
        "pattern_flips": len(flips),
        "flipped": flips,
        "max_wpi_abs_error": wpi_err,
        "runs_per_leg": reps,
    }
    print(json.dumps(summary))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hll_last.json")
    with open(art, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
