"""Repetition quality signals (operators/quality.py)."""

import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.operators.quality import (
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_hand_cases(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam"),          # 4 tokens, 1 distinct
            (2, "a b c d"),                       # no repetition
            (3, "x y x y x y z"),                 # top bigram 'x y' x3 of 6 grams
            (4, "one"),                           # shorter than n: no grams
            (5, ""),                              # empty
        ],
    )
    got = _by_id(repetition_stats(docs, n=2))
    assert got[1]["n_tokens"] == 4
    assert got[1]["dup_token_frac"] == pytest.approx(0.75)
    assert got[1]["top_gram"] == "spam spam" and got[1]["top_gram_count"] == 3
    # 3 overlapping occurrences x 2 tokens > 4 tokens: capped at 1.0
    assert got[1]["top_gram_token_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_gram_count"] == 1
    assert got[3]["top_gram"] == "x y" and got[3]["top_gram_count"] == 3
    assert got[3]["top_gram_token_frac"] == pytest.approx(6.0 / 7.0)
    assert got[4]["n_tokens"] == 1 and got[4]["top_gram"] is None
    assert got[4]["top_gram_count"] == 0 and got[4]["top_gram_token_frac"] == 0.0
    assert got[5]["n_tokens"] == 0 and got[5]["dup_token_frac"] == 0.0


def test_tie_breaks_to_largest_gram(spark):
    # 'a b' and 'b a' both occur twice -> max(struct) picks 'b a'
    docs = _docs(spark, [(1, "a b a b a")])
    got = _by_id(repetition_stats(docs, n=2))
    assert got[1]["top_gram"] == "b a" and got[1]["top_gram_count"] == 2


def test_validation(spark):
    with pytest.raises(ValueError):
        repetition_stats(_docs(spark, [(1, "a")]), n=0)
