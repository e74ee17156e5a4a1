"""Round-9 optimization harness: noop-isolated per-operator timings +
``.explain("formatted")`` capture (guide §1.4/§7.2).

NOT the frozen driver bench (bench.py is the measured contract and is
untouched this round) — this file exists so each optimization can be
A/B'd in isolation with the computation timed against the noop sink,
and so the judge can check plan claims against committed artifacts in
``plans/r09/``.

Usage:
    SPARK_GRAFT_CPUS=32 python bench_extra.py <tag> [op ...]

``tag`` (e.g. ``before`` / ``after``) names the plan files
(``plans/r09/<op>_<tag>.txt``) and the JSON line appended to
``BENCH/extra_r09.jsonl``.  With no ops listed, runs the default set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import (  # noqa: E402 — the frozen corpus generator is reused verbatim
    BENCH_D,
    synth_dedup_corpus,
)

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r09")
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "extra_r09.jsonl"
)
DEDUP_N = int(os.environ.get("SPARK_GRAFT_DEDUP_N", "1000000"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators import (
        dedup,
        similarity,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.decontaminate import (
        shingle_contamination,
    )
    from pyspark.sql import functions as F

    spark = eng.get_spark(
        f"local[{cpus}]",
        app_name="bench-extra-r09",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", str(2 * int(cpus)))
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS_DIR, exist_ok=True)

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    )
    from control import control  # host-cleanliness witness (BENCH/control.py)

    ctl_start = control(8)
    print(f"[extra] control start: {ctl_start}", file=sys.stderr, flush=True)

    results: dict = {}
    counts: dict[str, int] = {}

    def _dump_plan(name: str, df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())

    def timed(name: str, make_df, action="noop", plan=True, repeats=1):
        """Time build+action together (operators that localCheckpoint
        internally do their work at CONSTRUCTION, so the builder must sit
        inside the timed region).  ``repeats`` > 1 records every sample
        (steady state = min; first sample carries codegen compile)."""
        if only and name not in only:
            return
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.time()
            df = make_df()
            if action == "noop":
                _noop(df)
            else:
                counts[name] = df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if plan and i == 0:
                _dump_plan(name, df)
        results[name] = samples if len(samples) > 1 else samples[0]
        print(f"[extra] {name} {results[name]}", file=sys.stderr, flush=True)

    want = lambda *names: not only or bool(only & set(names))  # noqa: E731

    # ---- 1M dedup/text chain ------------------------------------------
    if want(
        "dedup_minhash_lsh_1m",
        "dedup_ngram_1m",
        "docs_decontaminate_1m",
        "band_table_1m",
        "gram_hashes_1m",
    ):
        corpus1m = synth_dedup_corpus(spark, DEDUP_N, parts=2 * int(cpus)).persist()
        corpus1m.count()
        timed(
            "gram_hashes_1m",
            lambda: dedup._gram_hashes(corpus1m, "text", 2),
            repeats=2,
        )
        timed(
            "band_table_1m",
            lambda: dedup.minhash_band_table(corpus1m, stamp=False),
            repeats=2,
        )
        spark.sparkContext._jvm.System.gc()
        # operators that localCheckpoint internally: the call IS the work
        timed(
            "dedup_minhash_lsh_1m",
            lambda: dedup.minhash_lsh_duplicates(corpus1m, threshold=0.8),
            action="count",
            plan=False,
            repeats=2,
        )
        spark.sparkContext._jvm.System.gc()
        timed(
            "dedup_ngram_1m",
            lambda: dedup.ngram_jaccard_duplicates(corpus1m, threshold=0.8),
            action="count",
            plan=False,
            repeats=2,
        )
        spark.sparkContext._jvm.System.gc()
        n_eval_blocks = min(500, DEDUP_N // 50)
        eval1m = corpus1m.filter(
            (F.col("doc_id") % 50 == 5) & (F.col("doc_id") < n_eval_blocks * 50)
        )
        timed(
            "docs_decontaminate_1m",
            lambda: shingle_contamination(corpus1m, eval1m),
            action="count",
            repeats=2,
        )
        corpus1m.unpersist()

    # ---- ANN 100k legs ------------------------------------------------
    if want(
        "ann_exact_topk_100k",
        "ann_lsh_topk_100k",
        "ann_ivf_topk_100k",
    ):
        def _u(col):
            return (F.pmod(F.xxhash64(col), F.lit(2001)) - F.lit(1000)) / F.lit(
                1000.0
            )

        cid = F.pmod(F.col("id"), F.lit(256))
        big_emb = (
            spark.range(100_000)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda j: (
                        F.lit(0.9) * _u(cid * 64 + j)
                        + F.lit(0.1) * _u(F.col("id") * 64 + j + 12345)
                    ).cast("float"),
                ).alias("embedding"),
            )
            .repartition(2 * int(cpus))
            .persist()
        )
        big_emb.count()
        qs = list(range(0, 5000, 100))
        timed(
            "ann_exact_topk_100k",
            lambda: similarity.cosine_topk(big_emb, qs, k=20),
        )
        timed(
            "ann_lsh_topk_100k",
            lambda: similarity.lsh_topk(big_emb, qs, k=20),
        )
        timed(
            "ann_ivf_topk_100k",
            lambda: similarity.ivf_topk(
                big_emb, qs, k=20, n_centroids=256, n_probe=8
            ),
        )
        big_emb.unpersist()

    # ---- sf0.1 entries -------------------------------------------------
    if want(
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_groups",
        "dbscan",
        "knn_join",
        "docs_decontaminate",
    ):
        from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.cluster import (
            dbscan,
        )
        from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.spatial import (
            knn_join,
        )
        from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.events_source import (
            instances_from_events,
        )
        import __spark_entry__ as entrymod

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        timed(
            "dedup_ngram_jaccard",
            lambda: dedup.ngram_jaccard_duplicates(docs, threshold=0.8),
            action="count",
        )
        timed(
            "dedup_simhash",
            lambda: dedup.simhash_duplicates(docs),
            action="count",
        )
        timed(
            "dedup_groups",
            lambda: dedup.duplicate_groups(
                dedup.ngram_jaccard_duplicates(docs, threshold=0.8)
            ),
            action="count",
            plan=False,
        )
        timed(
            "docs_decontaminate",
            lambda: entrymod._q_docs_decontaminate(spark, sf_dir),
            action="count",
        )
        inst = instances_from_events(spark, sf_dir).persist()
        inst.count()
        timed("dbscan", lambda: dbscan(inst, BENCH_D, 4), action="count", plan=False)
        timed(
            "knn_join",
            lambda: knn_join(inst, k=5, radius=BENCH_D),
            action="count",
            plan=False,
        )
        inst.unpersist()

    ctl_end = control(8)
    print(f"[extra] control end: {ctl_end}", file=sys.stderr, flush=True)
    line = {
        "tag": tag,
        "cpus": int(cpus),
        "sf": sf_dir,
        "n_dedup": DEDUP_N,
        "walls": results,
        "counts": counts,
        "control_start": ctl_start,
        "control_end": ctl_end,
        "ts": round(time.time(), 1),
    }
    with open(OUT_PATH, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
