"""Bucketed co-located joins (sources/bucketed.py): the write-time
shuffle must buy ZERO runtime Exchanges on matching-key joins and
downstream aggregations, with results identical to the plain join."""

import pytest
from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.bucketed import (
    co_bucketed_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path: tiny test tables would otherwise
    broadcast, which has no Exchange either way and proves nothing."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _fact(spark, col):
    return spark.range(5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias(col)
    )


def test_join_and_agg_are_exchange_free(no_broadcast, tmp_path):
    spark = no_broadcast
    write_bucketed(_fact(spark, "v"), "tbk_a", str(tmp_path / "a"), ["k"], 8)
    write_bucketed(_fact(spark, "w"), "tbk_b", str(tmp_path / "b"), ["k"], 8)
    j = co_bucketed_join(spark, "tbk_a", "tbk_b", ["k"])
    assert exchange_count(j) == 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    # the aggregation on the bucket key inherits the distribution too
    agg = j.groupBy("k").agg(F.count("*").alias("n"))
    assert exchange_count(agg) == 0
    # the same join without bucketing shuffles both sides
    plain = _fact(spark, "v").join(_fact(spark, "w"), ["k"])
    assert exchange_count(plain) == 2


def test_results_match_plain_join(no_broadcast, tmp_path):
    spark = no_broadcast
    write_bucketed(_fact(spark, "v"), "tbk_c", str(tmp_path / "c"), ["k"], 8)
    write_bucketed(_fact(spark, "w"), "tbk_d", str(tmp_path / "d"), ["k"], 8)
    got = sorted(
        tuple(r)
        for r in co_bucketed_join(spark, "tbk_c", "tbk_d", ["k"]).collect()
    )
    expected = sorted(
        tuple(r) for r in _fact(spark, "v").join(_fact(spark, "w"), ["k"]).collect()
    )
    assert got == expected


def test_join_on_subset_of_bucket_key_still_shuffles(no_broadcast, tmp_path):
    """Bucketing on (k, k2) fixes the hash of BOTH columns; a join on k
    alone cannot reuse it — documents the exact contract users must
    follow at scale."""
    spark = no_broadcast
    two = spark.range(5000).select(
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 7).alias("k2"),
        F.col("id").alias("v"),
    )
    write_bucketed(two, "tbk_e", str(tmp_path / "e"), ["k", "k2"], 8)
    write_bucketed(
        two.withColumnRenamed("v", "w"), "tbk_f", str(tmp_path / "f"), ["k", "k2"], 8
    )
    full = co_bucketed_join(spark, "tbk_e", "tbk_f", ["k", "k2"])
    assert exchange_count(full) == 0
    subset = spark.table("tbk_e").join(
        spark.table("tbk_f").select("k", "w"), ["k"]
    )
    assert exchange_count(subset) > 0


def test_validation(spark, tmp_path):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "tbk_g", str(tmp_path / "g"), ["k"], 0)
    with pytest.raises(ValueError):
        write_bucketed(df, "tbk_h", str(tmp_path / "h"), [], 8)


def test_append_mode_preserves_existing_rows(spark, tmp_path):
    df1 = _fact(spark, "v").filter(F.col("v") < 2500)
    df2 = _fact(spark, "v").filter(F.col("v") >= 2500)
    write_bucketed(df1, "tbk_i", str(tmp_path / "i"), ["k"], 4)
    write_bucketed(df2, "tbk_i", str(tmp_path / "i"), ["k"], 4, mode="append")
    assert spark.table("tbk_i").count() == 5000


def test_exchange_count_sees_untagged_shuffles(spark):
    assert exchange_count(spark.range(100).repartition(4)) == 1
    # a broadcast is not a shuffle
    small = spark.range(10).selectExpr("id AS k")
    big = spark.range(1000).selectExpr("id AS k", "id AS v")
    j = big.join(F.broadcast(small), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert exchange_count(j) == 0


def test_exchange_count_tree_walk_matches_textual(spark):
    """The py4j class-name walk (primary since r06) and the legacy line
    regex must agree on plans that mix shuffles, broadcasts, sorts and
    aggregations — if the walk ever silently under-counts, this canary and
    test_exchange_count_sees_untagged_shuffles catch it."""
    import re

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.bucketed import (
        _count_shuffle_nodes,
    )

    big = spark.range(2000).selectExpr("id % 7 AS k", "id AS v")
    other = spark.range(500).selectExpr("id % 7 AS k", "id AS w")
    plans = [
        big.groupBy("k").count(),
        big.join(other, "k").groupBy("k").agg(F.sum("v")),
        big.repartition(4, "k").sortWithinPartitions("v"),
        big.join(F.broadcast(other), "k"),
    ]
    for df in plans:
        jplan = df._jdf.queryExecution().executedPlan()
        textual = sum(
            1
            for ln in jplan.toString().splitlines()
            if re.search(r"(?<![A-Za-z])Exchange ", ln)
        )
        assert _count_shuffle_nodes(jplan) == textual == exchange_count(df)


def test_stored_band_table_probe_is_stored_side_exchange_free(
    no_broadcast, tmp_path
):
    """The incremental-dedup probe pattern (bench dedup_incremental_1m):
    the base corpus's band table is written bucketed on the exact join
    key (band, bh), so the STORED side must plan with zero shuffle
    Exchanges (only the small shard side shuffles — bucketing on a
    strict SUBSET like bh alone gets "disabled by query planner" and
    shuffles both sides).  One Exchange total; the unbucketed twin
    shuffles both sides."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.dedup import (
        minhash_band_table,
    )

    spark = no_broadcast
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 40).cast("string"),
            F.lit(" x"), (F.col("id") % 7).cast("string"),
            F.lit(" y"), (F.col("id") % 11).cast("string"),
            F.lit(" z"), (F.col("id") % 13).cast("string"),
        ).alias("text"),
    )
    stored = write_bucketed(
        minhash_band_table(docs),
        "tbk_bands",
        str(tmp_path / "bands"),
        ["band", "bh"],
        8,
    ).drop("sig_v")
    fresh = minhash_band_table(
        docs.withColumn("doc_id", F.col("doc_id") + 1000), stamp=False
    )
    probe = fresh.join(stored, ["band", "bh"])
    n_exchanges = exchange_count(probe)
    assert n_exchanges <= 1, f"stored side shuffled: {n_exchanges} Exchanges"
    plain = fresh.join(minhash_band_table(docs, stamp=False), ["band", "bh"])
    assert exchange_count(plain) == 2
