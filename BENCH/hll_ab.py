"""approx_rsd (HyperLogLog++ participation) A/B at scale: the 2M-instance
scaling workload mined twice — exact countDistinct vs approx_count_distinct
(rsd=0.01) — quantifying the distinct-shuffle saving of the heaviest
aggregate in the plan (plans/miner.py::_ndistinct) and the pattern-flip
rate near the prevalence threshold.

Run:  python BENCH/hll_ab.py           # prints one JSON line, saves
                                       # BENCH/hll_last.json
Env:  SPARK_GRAFT_SCALE_REP / _D / _MAXK reuse scaling.py's knobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from BENCH.scaling import D, MAX_K, MIN_PREV, REP, build_instances  # noqa: E402


def mine_once(spark, inst, approx_rsd: float | None):
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng

    t0 = time.time()
    res = eng.ColocationMiner(
        spark,
        eng.ColocationConfig(
            D,
            MIN_PREV,
            max_pattern_size=MAX_K,
            salt_threshold=None,
            approx_rsd=approx_rsd,
        ),
    ).mine_subtrees(inst)
    return time.time() - t0, res


def main() -> None:
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng

    spark = eng.get_spark(
        "local[32]",
        app_name="hll-ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    inst = build_instances(spark, REP).persist()
    n = inst.count()
    # warm JIT/caches once so the A/B legs see the same state
    mine_once(spark, inst, None)
    t_exact, res_exact = mine_once(spark, inst, None)
    t_hll, res_hll = mine_once(spark, inst, 0.01)
    exact_set = {tuple(p) for p in res_exact.patterns}
    hll_set = {tuple(p) for p in res_hll.patterns}
    flips = sorted(exact_set ^ hll_set)
    # directly measured HLL-induced WPI error on the patterns both runs
    # selected (sub-threshold candidates aren't exposed by mine(), so the
    # flip evidence is pattern_flips itself, not a margin claim)
    common = exact_set & hll_set
    wpi_err = max(
        (abs(res_exact.wpi[p] - res_hll.wpi[p]) for p in common), default=None
    )
    out = {
        "metric": "miner participation agg: exact countDistinct vs HLL rsd=0.01",
        "n_instances": n,
        "pairs": res_exact.pair_count,
        "exact_sec": round(t_exact, 2),
        "hll_sec": round(t_hll, 2),
        "speedup": round(t_exact / t_hll, 3),
        "patterns_exact": len(exact_set),
        "patterns_hll": len(hll_set),
        "pattern_flips": len(flips),
        "flipped": [list(p) for p in flips],
        "max_wpi_abs_error": wpi_err,
    }
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hll_last.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
