"""Invariant tests for the bench 1M-doc dedup-scale corpus generator.

bench.py's dedup-chain walls only mean something because the corpus has
an EXACTLY known near-dup structure — these tests pin that structure on
a 5,000-doc twin (identical generator, identical block layout) so the
bench invariants can't silently drift from the generator.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators import (  # noqa: E402
    dedup,
)

N = 5_000  # 100 blocks of 50: 10 triples + 90 pairs


def test_expectations_formula():
    exp = bench.dedup_scale_expectations(N)
    assert exp == {
        "expected_pairs": 90 + 3 * 10,
        "expected_dropped": 90 + 2 * 10,
        "expected_kept": N - 110,
    }
    exp1m = bench.dedup_scale_expectations(1_000_000)
    assert exp1m["expected_pairs"] == 24_000
    assert exp1m["expected_kept"] == 978_000


def test_corpus_shape_and_determinism(spark):
    c1 = bench.synth_dedup_corpus(spark, N, parts=8)
    assert c1.count() == N
    # every doc has exactly TPD tokens (the packing invariant's basis)
    ntok = c1.select(F.size(F.split("text", " ")).alias("n")).distinct().collect()
    assert [r["n"] for r in ntok] == [bench.DEDUP_TPD]
    # deterministic: two independent generations are identical
    c2 = bench.synth_dedup_corpus(spark, N, parts=8)
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0


def test_minhash_pairs_and_membership_match_expectations(spark):
    exp = bench.dedup_scale_expectations(N)
    corpus = bench.synth_dedup_corpus(spark, N, parts=8).persist()
    pairs = dedup.minhash_lsh_duplicates(corpus, threshold=0.8)
    got = pairs.collect()
    assert len(got) == exp["expected_pairs"]
    # every pair is inside one block's member set and clears the threshold
    for r in got:
        assert r.a_id // bench.DEDUP_BLOCK == r.b_id // bench.DEDUP_BLOCK
        assert r.a_id % bench.DEDUP_BLOCK < 3 and r.b_id % bench.DEDUP_BLOCK < 3
        assert r.jaccard >= 0.8
    m = dedup.dedup_membership(corpus, pairs)
    counts = {r["kept"]: r["count"] for r in m.groupBy("kept").count().collect()}
    assert counts.get(True, 0) == exp["expected_kept"]
    assert sum(counts.values()) == N
    corpus.unpersist()


def test_contamination_eval_set_exact(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.decontaminate import (
        shingle_contamination,
    )

    corpus = bench.synth_dedup_corpus(spark, N, parts=8).persist()
    n_eval_blocks = min(500, N // bench.DEDUP_BLOCK)
    ev = corpus.filter(
        (F.col("doc_id") % bench.DEDUP_BLOCK == 5)
        & (F.col("doc_id") < n_eval_blocks * bench.DEDUP_BLOCK)
    )
    out = shingle_contamination(corpus, ev).collect()
    # unique docs' 13-grams occur nowhere else: contaminated == eval set
    assert {r.doc_id for r in out} == {
        b * bench.DEDUP_BLOCK + 5 for b in range(n_eval_blocks)
    }
    corpus.unpersist()


def test_incremental_expectations_formula():
    exp = bench.dedup_incremental_expectations(1_000_000)
    assert exp == {
        "expected_inc_pairs": 2400 + 1100,
        "expected_shard_docs": 2000 * 50 + 1000,
        "expected_kept": 978_000,
    }
    # below the within-shard region: cross pairs only
    exp_small = bench.dedup_incremental_expectations(N)
    assert exp_small == {
        "expected_inc_pairs": 90 + 2 * 10,
        "expected_shard_docs": 100,
        "expected_kept": 4_890,
    }


def test_incremental_shard_pipeline_small(spark):
    """The bench incremental leg's exact shape at the 5,000-doc twin:
    stored base bands + shard probe must find exactly the closed-form
    cross pairs and fold into the union's exact survivor count."""
    exp = bench.dedup_incremental_expectations(N)
    corpus = bench.synth_dedup_corpus(spark, N, parts=8).persist()
    shard_cond = (
        F.col("doc_id") >= bench.INC_SHARD_BLOCK_FROM * bench.DEDUP_BLOCK
    ) | (
        (F.col("doc_id") % bench.DEDUP_BLOCK == 1)
        & (F.col("doc_id") < bench.INC_CROSS_BLOCKS * bench.DEDUP_BLOCK)
    )
    base, new = corpus.filter(~shard_cond), corpus.filter(shard_cond)
    assert new.count() == exp["expected_shard_docs"]
    union_pairs = dedup.minhash_lsh_duplicates(corpus, threshold=0.8)
    new_ids = new.select(F.col("doc_id").alias("a_id"))
    base_pairs = union_pairs.join(new_ids, "a_id", "left_anti").join(
        new_ids.withColumnRenamed("a_id", "b_id"), "b_id", "left_anti"
    )
    base_m = dedup.dedup_membership(base, base_pairs)
    bands = dedup.minhash_band_table(base)
    inc_pairs = dedup.incremental_duplicates(new, base, bands, threshold=0.8)
    assert inc_pairs.count() == exp["expected_inc_pairs"]
    verdict = dedup.dedup_incremental(base_m, new, inc_pairs)
    assert verdict.count() == N
    assert verdict.filter("kept").count() == exp["expected_kept"]
    corpus.unpersist()
