"""Sessionization + deterministic split assignment: hand-checkable cases
(the Spark-vs-DuckDB equivalence is covered by test_entry_contract)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
    hash_bucket,
    split_assign,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.sessions import (
    sessionize,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, e, dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)) for u, e, s in rows],
        "user_id bigint, event_id bigint, ts timestamp",
    )


def test_sessionize_gap_splits_sessions(spark):
    # user 1: events at 0s, 100s (same session), then 3000s (> 1800 gap)
    # user 2: single event
    df = _ev(spark, [(1, 10, 0), (1, 11, 100), (1, 12, 3000), (2, 20, 50)])
    out = {
        (r.user_id, r.session_id): (r.n_events, r.duration_sec)
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert out == {(1, 1): (2, 100), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_sessionize_boundary_gap_keeps_session(spark):
    # a gap of EXACTLY gap_seconds does not split (> is strict)
    df = _ev(spark, [(1, 1, 0), (1, 2, 1800)])
    out = sessionize(df, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_sessionize_same_ts_tiebreak_deterministic(spark):
    # two events at the identical timestamp stay in one session and the
    # numbering is stable regardless of input order
    a = sessionize(_ev(spark, [(1, 5, 0), (1, 6, 0)])).collect()
    b = sessionize(_ev(spark, [(1, 6, 0), (1, 5, 0)])).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0].n_events == 2


def test_split_assign_partition_and_determinism(spark):
    df = spark.range(10_000).select(
        F.col("id"),
        split_assign(F.col("id")).alias("split"),
        hash_bucket(F.col("id")).alias("bucket"),
    )
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # buckets are ~uniform: 80/10/10 within a loose tolerance
    assert 0.75 <= counts["train"] / 10_000 <= 0.85
    assert 0.07 <= counts["val"] / 10_000 <= 0.13
    # membership is a pure function of the key: a filtered re-run agrees
    sub = spark.range(100).select(F.col("id"), split_assign(F.col("id")).alias("split"))
    full = {r.id: r["split"] for r in df.filter(F.col("id") < 100).collect()}
    assert {r.id: r["split"] for r in sub.collect()} == full


def test_split_assign_validation(spark):
    with pytest.raises(ValueError):
        split_assign(F.lit(1), train_pct=95, val_pct=10)


def test_sessionize_matches_python_reference(spark):
    # randomized-but-deterministic corpus vs a straightforward driver-side
    # reference implementation (sorted sweep per user)
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    for u in range(1, 8):
        for _ in range(rng.randint(0, 40)):
            rows.append((u, eid, rng.randint(0, 50_000)))
            eid += 1
    gap = 1800
    df = _ev(spark, rows)
    got = {
        (r.user_id, r.session_id): (r.n_events, r.start_tse, r.end_tse)
        for r in sessionize(df, gap_seconds=gap).collect()
    }

    base_epoch = int(dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc).timestamp())
    want = {}
    by_user = {}
    for u, e, s in rows:
        by_user.setdefault(u, []).append((base_epoch + s, e))
    for u, evs in by_user.items():
        evs.sort()
        sid, n, start, last = 0, 0, None, None
        for ts, _ in evs:
            if last is None or ts - last > gap:
                if n:
                    want[(u, sid)] = (n, start, last)
                sid += 1
                n, start = 0, ts
            n += 1
            last = ts
        if n:
            want[(u, sid)] = (n, start, last)
    assert got == want


def test_stratified_keep_rates_and_determinism(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
        stratified_keep,
    )

    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = df.filter(
        stratified_keep(F.col("doc_id"), F.col("lang"), {"en": 0.25, "de": 0.75})
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 10k per stratum; md5 buckets are uniform, allow +-5% absolute
    assert abs(counts["en"] - 2500) < 500, counts
    assert abs(counts["de"] - 7500) < 500, counts
    # determinism + repartition-invariance: same membership on a reshuffled frame
    again = set(
        r["doc_id"]
        for r in df.repartition(17)
        .filter(stratified_keep(F.col("doc_id"), F.col("lang"), {"en": 0.25, "de": 0.75}))
        .collect()
    )
    assert again == set(r["doc_id"] for r in kept.collect())


def test_stratified_keep_edge_rates_and_default(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
        stratified_keep,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("zz")
        .alias("s"),
    )
    kept = df.filter(
        stratified_keep(F.col("doc_id"), F.col("s"), {"a": 0.0, "b": 1.0}, default_rate=1.0)
    )
    counts = {r["s"]: r["n"] for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    # ids in [0,1000): 334 hit %3==0 ('a'), 333 hit %3==1 ('b'), 333 rest
    assert "a" not in counts            # rate 0 drops everything
    assert counts["b"] == 333           # rate 1 keeps everything
    assert counts["zz"] == 333          # default rate applies to unknown strata


def test_stratified_keep_validates_rates(spark):
    import pytest as _pytest

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
        stratified_keep,
    )

    with _pytest.raises(ValueError):
        stratified_keep(F.lit(1), F.lit("x"), {"x": 1.5})
    with _pytest.raises(ValueError):
        stratified_keep(F.lit(1), F.lit("x"), {}, default_rate=-0.1)


def test_stratified_keep_independent_of_split(spark):
    """Domain separation: keep decisions must not correlate with split
    membership (the 'sample:' prefix gives an independent hash stream)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
        split_assign,
        stratified_keep,
    )

    df = spark.range(20000).select(F.col("id").alias("k"))
    both = df.select(
        split_assign(F.col("k")).alias("split"),
        stratified_keep(F.col("k"), F.lit("en"), {"en": 0.5}).alias("keep"),
    )
    rates = {
        r["split"]: r["kept"] / r["n"]
        for r in both.groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
        )
        .collect()
    }
    for split, rate in rates.items():
        assert abs(rate - 0.5) < 0.05, rates


def test_stratified_keep_threshold_rounds_not_truncates(spark):
    """Advice-r06: 0.29 * 1_000_000 is 289999.999... in floats — int()
    truncation gave threshold 289999 where every independently computed
    round(rate * buckets) oracle says 290000.  Mirror the documented
    rule (round-half-even) in pure Python md5 arithmetic and require
    exact membership agreement."""
    import hashlib

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.sampling import (
        stratified_keep,
    )

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    kept = set(
        r["doc_id"]
        for r in df.filter(
            stratified_keep(F.col("doc_id"), F.col("lang"), {"en": 0.29})
        ).collect()
    )
    thr = round(0.29 * 1_000_000)
    assert thr == 290_000  # the truncation bug would use 289_999
    want = set(
        i
        for i in range(n)
        if int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:15], 16)
        % 1_000_000
        < thr
    )
    assert kept == want
