"""Train/test contamination detection (operators/decontaminate.py)."""

import pytest
from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.decontaminate import (
    shingle_contamination,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_ngram_copy_is_flagged(spark):
    bench = _docs(spark, [(100, "a b c d e f g h i j k l m")])  # 13 tokens
    train = _docs(
        spark,
        [
            (1, "x y a b c d e f g h i j k l m z"),  # contains the 13-run
            (2, "a b c d e f g h i j k l"),  # only 12 tokens: clean
            (3, "totally different words here"),
        ],
    )
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in shingle_contamination(train, bench, n=13).collect()
    }
    assert got == {1: 1}


def test_counts_distinct_shingles_once(spark):
    # the shared shingle occurs twice in the train doc but is one
    # DISTINCT shingle -> counted once; two different shared shingles
    # count as two
    bench = _docs(spark, [(100, "a b c"), (101, "d e f")])
    train = _docs(
        spark,
        [
            (1, "a b c x a b c"),  # same shared 3-gram twice
            (2, "a b c y d e f"),  # two distinct shared 3-grams
        ],
    )
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in shingle_contamination(train, bench, n=3).collect()
    }
    assert got == {1: 1, 2: 2}


def test_case_and_whitespace_normalized(spark):
    bench = _docs(spark, [(100, "Alpha  Beta\tGamma")])
    train = _docs(spark, [(1, "alpha beta gamma")])
    out = shingle_contamination(train, bench, n=3).collect()
    assert [(r["doc_id"], r["n_contaminated"]) for r in out] == [(1, 1)]


def test_broadcast_off_same_result(spark):
    bench = _docs(spark, [(100, "a b c d"), (101, "p q r s")])
    train = _docs(spark, [(1, "z a b c d z p q r s"), (2, "no overlap at all")])
    on = sorted(
        tuple(r) for r in shingle_contamination(train, bench, n=4).collect()
    )
    off = sorted(
        tuple(r)
        for r in shingle_contamination(
            train, bench, n=4, broadcast=False
        ).collect()
    )
    assert on == off and len(on) == 1


def test_hashed_vs_string_shingles_same_result(spark):
    """The int64-hashed broadcast path (round-5 verdict #4) must be
    output-identical to the exact string join on a collision-free corpus
    (any real corpus — collisions are 2^-64-per-pair)."""
    bench = _docs(spark, [(100, "a b c d e"), (101, "p q r s t")])
    train = _docs(
        spark,
        [
            (1, "z a b c d e z p q r s t"),
            (2, "a b c d e a b c d e"),
            (3, "nothing shared here at all"),
        ],
    )
    hashed = sorted(
        tuple(r) for r in shingle_contamination(train, bench, n=5).collect()
    )
    strings = sorted(
        tuple(r)
        for r in shingle_contamination(
            train, bench, n=5, hash_shingles=False
        ).collect()
    )
    assert hashed == strings and len(hashed) == 2


def test_validation(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        shingle_contamination(d, d, n=0)


def test_entry_finds_planted_near_dups(spark):
    """The synthetic corpus plants near-duplicates; some straddle the
    benchmark/train split, so the sf0.001 entry must flag at least one
    doc — guards against a vacuously-empty contract row."""
    import __spark_entry__ as entrymod

    out = entrymod._q_docs_decontaminate(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) >= 1
    # near-duplicates share long runs, so a genuine hit carries MANY
    # shared 13-grams — a max of 1 would mean the only matches were
    # chance collisions, not the planted dups this guard is about
    assert max(r["n_contaminated"] for r in rows) >= 2
