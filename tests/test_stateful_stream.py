"""Custom stateful streaming operator (applyInPandasWithState)."""

import datetime

from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.cells import (
    GridSpec,
    with_cell,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.stateful import (
    run_update_stream,
    run_update_stream_durable,
    streaming_tile_state,
)


def test_stateful_totals_match_batch_and_hot_fires_once(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    # cell (0,0) gets 150 rows (crosses the hot threshold 100); (1,1) gets 30
    rows = [(base + datetime.timedelta(seconds=i), "A", 0.5, 0.5) for i in range(150)]
    rows += [(base + datetime.timedelta(seconds=i), "B", 2.5, 2.5) for i in range(30)]
    df = spark.createDataFrame(rows, "ts timestamp, feature string, x double, y double")
    src = str(tmp_path / "src")
    # several files -> several micro-batches under maxFilesPerTrigger
    df.repartition(6).write.parquet(src)

    grid = GridSpec(0.0, 0.0, 4.0, 4.0, 2.0)
    sdf = streaming_tile_state(spark, src, grid)
    run_update_stream(sdf, str(tmp_path / "ckpt"), "tile_state")

    out = spark.sql("select * from tile_state").collect()
    # final cumulative totals per cell match the batch ground truth
    finals = {}
    hot_fires = {}
    for r in out:
        key = (r.cell_x, r.cell_y)
        finals[key] = max(finals.get(key, 0), r.total)
        hot_fires[key] = hot_fires.get(key, 0) + int(r.went_hot)
    batch = {
        (r.cell_x, r.cell_y): r.n
        for r in with_cell(df, grid).groupBy("cell_x", "cell_y").agg(F.count("*").alias("n")).collect()
    }
    assert finals == batch
    assert hot_fires[(0, 0)] == 1  # fires exactly once despite several batches
    assert hot_fires.get((1, 1), 0) == 0  # never crossed


def test_stateful_resume_from_checkpoint(spark, tmp_path):
    """State survives a stop/restart via the streaming checkpoint."""
    base = datetime.datetime(2024, 1, 1)
    grid = GridSpec(0.0, 0.0, 4.0, 4.0, 2.0)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    df1 = spark.createDataFrame(
        [(base, "A", 0.5, 0.5)] * 60, "ts timestamp, feature string, x double, y double"
    )
    df1.coalesce(1).write.mode("append").parquet(src)
    run_update_stream_durable(streaming_tile_state(spark, src, grid), ckpt, out_dir)

    # second tranche arrives after the first drain completed
    df2 = spark.createDataFrame(
        [(base, "A", 0.6, 0.6)] * 70, "ts timestamp, feature string, x double, y double"
    )
    df2.coalesce(1).write.mode("append").parquet(src)
    run_update_stream_durable(streaming_tile_state(spark, src, grid), ckpt, out_dir)

    out = {r.total: r for r in spark.read.parquet(out_dir).collect()}
    # resumed state: 60 (from run 1) + 70 = 130 total, hot fired in run 2
    assert 60 in out and not out[60].went_hot
    assert 130 in out
    assert out[130].went_hot  # crossed 100 only after resuming with state 60


def test_streaming_dedup_matches_batch_distinct_across_batches(spark, tmp_path):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.dedup_stream import (
        streaming_exact_dedup,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.tile_stream import (
        run_available_now,
    )

    base = 1_700_000_000
    # 40 distinct texts, each duplicated 3x with different doc_ids and
    # event times, spread over MANY files so duplicates of one text land
    # in DIFFERENT micro-batches (maxFilesPerTrigger=16) — the dedup
    # state must carry across batches
    rows = [
        (copy * 1000 + i, f"text number {i}", base + i * 60 + copy)
        for i in range(40)
        for copy in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tse long").select(
        "doc_id", "text", F.timestamp_seconds("tse").alias("ts")
    )
    src = str(tmp_path / "dedup_src")
    df.repartition(40).write.parquet(src)

    sdf = streaming_exact_dedup(spark, src, watermark_delay="30 days")
    run_available_now(
        sdf, str(tmp_path / "dedup_ck"), "dedup_stream_t", output_mode="append"
    )
    got = {r.content_hash for r in spark.sql("select * from dedup_stream_t").collect()}
    expect = {r.h for r in df.select(F.md5("text").alias("h")).distinct().collect()}
    assert got == expect
    assert len(got) == 40  # the 80 duplicate arrivals were dropped


def test_stream_stream_spatiotemporal_matches_batch(spark, tmp_path):
    import math

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.cells import (
        GridSpec,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.st_pair_stream import (
        streaming_spatiotemporal_pairs,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.tile_stream import (
        run_available_now,
    )

    base = 1_700_000_000
    rows = [
        (
            f"F{i % 3}",
            f"p{i:03d}",
            float((i * 37) % 40),
            float((i * 61) % 40),
            base + (i * 733) % 20_000,
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "feature string, id string, x double, y double, tse long"
    ).select("feature", "id", "x", "y", F.timestamp_seconds("tse").alias("ts"))
    src = str(tmp_path / "st_src")
    # many files -> pairs straddle micro-batches; the join state must hold
    # earlier arrivals until their partners appear in later triggers
    df.repartition(40).write.parquet(src)

    d, tau = 6.0, 3600
    grid = GridSpec(0.0, 0.0, 40.0, 40.0, d)
    sdf = streaming_spatiotemporal_pairs(spark, src, grid, d, tau)
    run_available_now(sdf, str(tmp_path / "st_ck"), "st_pairs_t", output_mode="append")
    got = {
        (r.a_id, r.b_id, r.dt_seconds)
        for r in spark.sql("select * from st_pairs_t").collect()
    }
    expect = set()
    for fa, ia, xa, ya, ta in rows:
        for fb, ib, xb, yb, tb in rows:
            if ia < ib and fa != fb and abs(ta - tb) <= tau:
                if math.sqrt((xa - xb) ** 2 + (ya - yb) ** 2) <= d:
                    expect.add((ia, ib, abs(ta - tb)))
    assert got == expect
    assert len(expect) >= 30  # non-vacuous: the fixture has real pairs


def test_streaming_sessionize_boundary_and_merge(spark, tmp_path):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.session_stream import (
        streaming_sessionize,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.streaming.tile_stream import (
        run_available_now,
    )

    base = 1_700_000_000
    # user 1: 0s, 100s (merge), an event EXACTLY gap later (merges too —
    # session_window's boundary is inclusive, same delta <= gap rule as
    # the batch operator), then gap+1s after that (splits)
    # user 2: one event
    rows = [
        (1, 10, 0),
        (1, 11, 100),
        (1, 12, 100 + 1800),
        (1, 13, 100 + 1800 + 1801),
        (2, 20, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, off long").select(
        "user_id", "event_id",
        F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts"),
    )
    src = str(tmp_path / "sess_src")
    df.repartition(4).write.parquet(src)

    sdf = streaming_sessionize(spark, src, gap_seconds=1800)
    run_available_now(
        sdf, str(tmp_path / "sess_ck"), "sess_stream_t", output_mode="complete"
    )
    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.sql("select * from sess_stream_t").collect()
    }
    u = 1_000_000
    assert got == {
        (1, base * u, (base + 1900 + 1800) * u, 3),
        (1, (base + 3701) * u, (base + 3701 + 1800) * u, 1),
        (2, (base + 5) * u, (base + 5 + 1800) * u, 1),
    }
