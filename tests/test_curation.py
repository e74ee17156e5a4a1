"""Skew-safe per-group top-k (operators/curation.py).

The operator's contract: output-identical to the naive single-window
row_number plan for ANY salt count, while the physical plan's expensive
first window partitions on (group, salt) instead of the low-cardinality
group key alone.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.curation import (
    topk_per_group,
)


def _skewed_df(spark):
    # one giant group (900 rows), a medium one, two tiny ones, duplicate
    # scores inside every group so the doc_id tiebreaker matters
    rows = []
    for i in range(900):
        rows.append((i, "en", float(i % 37)))
    for i in range(900, 980):
        rows.append((i, "fr", float(i % 11)))
    for i in range(980, 995):
        rows.append((i, "de", 3.0))
    rows.append((995, "xx", 1.0))
    return spark.createDataFrame(rows, "doc_id long, grp string, score double")


def _naive(df, k):
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


@pytest.mark.parametrize("num_salts", [1, 3, 64])
@pytest.mark.parametrize("k", [1, 5, 40])
def test_matches_naive_window(spark, num_salts, k):
    df = _skewed_df(spark).repartition(7)  # salt = partition id: exercise >1 salt
    expected = sorted(tuple(r) for r in _naive(df, k).collect())
    got = sorted(
        tuple(r)
        for r in topk_per_group(
            df,
            ["grp"],
            [F.col("score").desc(), F.col("doc_id").asc()],
            k,
            num_salts=num_salts,
        ).collect()
    )
    assert got == expected


def test_k_larger_than_every_group(spark):
    df = _skewed_df(spark)
    out = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("doc_id").asc()], 10_000
    )
    assert out.count() == df.count()


def test_plan_first_window_is_salted(spark):
    """The expensive (full-input) window must partition on (grp, salt),
    not on grp alone — that's the whole point of the operator."""
    df = _skewed_df(spark)
    out = topk_per_group(df, ["grp"], [F.col("score").desc()], 3, num_salts=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert len(windows) == 2, plan
    # executed bottom-up: the LAST textual Window node is the first executed
    assert "__tk_salt" in windows[-1], windows[-1]
    assert "__tk_salt" not in windows[0], windows[0]


def test_validation(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], [F.col("score")], 0)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], [F.col("score")], 3, num_salts=0)


def test_refuses_column_collisions(spark):
    """A pre-existing __tk_salt or rank_col column would be silently
    clobbered by withColumn + drop — refuse instead."""
    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="__tk_salt"):
        topk_per_group(
            df.withColumn("__tk_salt", F.lit(0)), ["grp"], [F.col("score")], 3
        )
    with pytest.raises(ValueError, match="score"):
        topk_per_group(df, ["grp"], [F.col("doc_id")], 3, rank_col="score")
