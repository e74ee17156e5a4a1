"""Emit the candidate-generation physical plans the r09 join-strategy
claims rest on (OPTIMIZATION_r09.md §4) into plans/r09/.

The dedup operators are eager (they localCheckpoint internally), so the
full operator cannot be explain()'d; these are the exact candidate
subplans as built by the operators, with and without the r09
SHUFFLE_HASH hints, over a checkpointed 50k-doc synthetic band/prefix
table (plan SHAPE is size-independent once inputs are checkpoints —
size estimates are unknown either way, so the strategy choice shown is
the one the 1M run takes).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_dedup_corpus  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng  # noqa: E402
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators import dedup  # noqa: E402
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.bucketed import write_bucketed  # noqa: E402

PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def dump(name, df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLANS, name), "w") as f:
        f.write(buf.getvalue())
    print("wrote", name)


def main():
    import shutil
    import tempfile
    import uuid

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = eng.get_spark(f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS, exist_ok=True)
    corpus = synth_dedup_corpus(spark, int(os.environ.get("PLANS_N", "50000")), parts=2 * cpus).persist()
    corpus.count()
    banded = dedup.minhash_band_table(corpus, stamp=False).localCheckpoint(eager=True)

    def band_cand(r_leg):
        return (
            banded.alias("l").join(r_leg, on=["band", "bh"])
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"))
            .distinct()
        )

    dump("minhash_cand_before.txt", band_cand(banded.alias("r")))
    dump("minhash_cand_after.txt", band_cand(banded.alias("r").hint("shuffle_hash")))

    threshold = 0.8
    gh = dedup._gram_hashes(corpus, "text", 2).localCheckpoint(eager=True)
    inv = gh.select("doc_id", F.size("gh").alias("sz"), F.explode("gh").alias("g"))
    df_counts = inv.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("g").asc())
    prefix = (
        inv.join(df_counts, "g").withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("doc_id", "sz", "pos", "g")
    ).localCheckpoint(eager=True)
    overlap_req = F.lit(threshold / (1.0 + threshold)) * (F.col("l.sz") + F.col("r.sz"))
    overlap_ub = F.least(F.col("l.pos"), F.col("r.pos")) + F.least(
        F.col("l.sz") - F.col("l.pos"), F.col("r.sz") - F.col("r.pos")
    )

    def prefix_cand(r_leg):
        return (
            prefix.alias("l").join(r_leg, on="g")
            .filter(
                (F.col("l.doc_id") < F.col("r.doc_id"))
                & (F.col("l.sz") >= F.lit(threshold) * F.col("r.sz"))
                & (F.col("r.sz") >= F.lit(threshold) * F.col("l.sz"))
                & (overlap_ub >= overlap_req)
            )
            .select(F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"))
            .distinct()
        )

    dump("ngram_cand_before.txt", prefix_cand(prefix.alias("r")))
    dump("ngram_cand_after.txt", prefix_cand(prefix.alias("r").hint("shuffle_hash")))

    tmp = tempfile.mkdtemp(prefix="plans_bands_")
    tbl = f"bands_plans_{uuid.uuid4().hex[:8]}"
    try:
        stored = write_bucketed(
            dedup.minhash_band_table(corpus.filter("doc_id % 2 = 0")), tbl,
            f"{tmp}/bands", bucket_cols=["band", "bh"], num_buckets=2 * cpus,
        ).drop("sig_v")
        nb = dedup.minhash_band_table(
            corpus.filter("doc_id % 2 = 1"), stamp=False
        ).localCheckpoint(eager=True)

        def cross(l_leg):
            return (
                l_leg.join(stored.alias("r"), on=["band", "bh"])
                .filter(F.col("l.doc_id") != F.col("r.doc_id"))
                .select(
                    F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("a_id"),
                    F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("b_id"),
                )
            )

        dump("incremental_cross_before.txt", cross(nb.alias("l")))
        dump("incremental_cross_after.txt", cross(nb.alias("l").hint("shuffle_hash")))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
