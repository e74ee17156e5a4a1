"""C4 heuristic cleaning rules (functions/text.py): hand cases pinning
each rule edge, per Raffel et al. 2020 §2.2."""

from pyspark.sql import functions as F

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.functions import (
    text as T,
)


def _one(spark, txt, col_fn):
    df = spark.createDataFrame([(txt,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


def test_line_keep_requires_terminal_punctuation(spark):
    keep = lambda s: _one(spark, s, lambda c: F.size(T.c4_kept_lines(c)))
    assert keep("this line ends properly.") == 1
    assert keep("does it end properly?") == 1
    assert keep("it ends with a bang!") == 1
    assert keep('he said "sure thing."') == 1
    assert keep("no terminal punctuation here") == 0
    assert keep("ends with a comma, sadly,") == 0
    # trailing whitespace is rtrimmed before the check
    assert keep("trailing spaces are fine.   ") == 1


def test_line_keep_word_floor_and_javascript(spark):
    keep = lambda s: _one(spark, s, lambda c: F.size(T.c4_kept_lines(c)))
    assert keep("Too short.") == 0  # 2 words < 3
    assert keep("Three words suffice.") == 1
    assert keep("Please enable JavaScript to continue.") == 0
    assert keep("javascript is mentioned mid-sentence here.") == 0


def test_kept_text_joins_surviving_lines(spark):
    txt = "Keep this line here.\nno punct\nAnd also keep this one!"
    assert (
        _one(spark, txt, T.c4_kept_text)
        == "Keep this line here.\nAnd also keep this one!"
    )


def test_page_keep_sentence_floor(spark):
    # 5 sentences on kept lines -> keep
    good = "One two three.\n" * 5
    assert _one(spark, good.rstrip("\n"), T.c4_page_keep) is True
    # 4 sentences -> drop
    assert _one(spark, ("One two three.\n" * 4).rstrip("\n"), T.c4_page_keep) is False
    # sentences on DROPPED lines don't count (line too short)
    assert _one(spark, "Hi there.\n" * 9, T.c4_page_keep) is False


def test_page_keep_lorem_and_brace(spark):
    base = "One two three.\n" * 5
    assert _one(spark, base + "Lorem Ipsum dolor sit amet.", T.c4_page_keep) is False
    assert _one(spark, base + "function() { return 1; }", T.c4_page_keep) is False


def test_sentence_count_counts_terminators(spark):
    assert _one(spark, "One. Two! Three? Four", T.sentence_count) == 3
    assert _one(spark, "", T.sentence_count) == 0
