"""Stage-level wall breakdown of minhash_lsh_duplicates at 1M docs.

The suite times the operator end-to-end (dedup_minhash_lsh_1m, 45-63 s);
this script attributes that wall to its physical stages so optimization
effort lands where the time actually goes:

  corpus    synth + persist (NOT part of the suite wall; timed for context)
  shingle   tokenize -> bigram -> distinct   (string-heavy, codegen)
  hash      xxhash64 + pmod per shingle      (JVM, feeds Arrow)
  sign      128 minhashes per doc            (Arrow batch -> numpy -> Arrow)
  band      32 band keys + explode           (JVM xxhash over sig slices)
  selfjoin  banded self-join -> distinct candidate pairs (the shuffle)
  verify    candidates x shingle sets, exact Jaccard
  full      the real operator end-to-end (persist + eager checkpoint),
            for cross-checking that stage sums roughly reproduce it

Each stage is forced with an aggregate that cannot be pruned away
(sum of array sizes / counts), on top of a persisted+counted upstream so
the stage wall isolates that stage's work.  Run while the host is quiet
(BENCH/control.py verdicts are printed before and after).

Usage:  python BENCH/profile_minhash_1m.py [n_docs]      # default 1e6
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from control import control  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench  # repo-root bench: corpus synth + session factory
    from pyspark.sql import functions as F

    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators import (
        dedup,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        _band_rows,
        _gram_hashes,
        _verify_candidates,
    )

    spark = eng.get_spark(f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_docs": n_docs, "cpus": cpus, "ctl_pre": control(8)}
    walls: dict = {}

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        walls[name] = round(time.monotonic() - t0, 2)
        print(f"{name:9s} {walls[name]:8.2f} s", flush=True)
        return r

    corpus = bench.synth_dedup_corpus(spark, n_docs, parts=2 * cpus).persist()
    timed("corpus", corpus.count)

    gh = _gram_hashes(corpus, "text", 2).persist()
    timed("gramhash", lambda: gh.agg(F.sum(F.size("gh"))).collect())

    # fused sign+band+explode: Arrow in (int64 gram hashes), 128 numpy
    # mins + splitmix band fold per row, skinny band ROWS out (never an
    # array column under a Generate — see _band_rows on why)
    banded = _band_rows(gh, 128, 32).persist()
    timed("signband", lambda: banded.count())

    cand = (
        banded.alias("l")
        .join(banded.alias("r"), on=["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"))
        .distinct()
        .persist()
    )
    n_cand = timed("selfjoin", cand.count)

    # the operator's own verify tail (shingle persist included), so the
    # stage wall measures exactly what the operator pays — a hand copy
    # here had drifted (unpersisted shingles -> double shingle scan)
    pairs = timed(
        "verify", lambda: _verify_candidates(cand, corpus, "text", 2, 0.8).count()
    )

    for df in (cand, banded, gh):
        df.unpersist()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    n_pairs_full = [0]
    timed(
        "full",
        lambda: n_pairs_full.__setitem__(
            0, dedup.minhash_lsh_duplicates(corpus, threshold=0.8).count()
        ),
    )

    out.update(
        {
            "walls_sec": walls,
            "candidates": n_cand,
            "pairs_staged": pairs,
            "pairs_full": n_pairs_full[0],
            "ctl_post": control(8),
        }
    )
    corpus.unpersist()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "profile_minhash_last.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "ctl_pre"})[:400])


if __name__ == "__main__":
    main()
