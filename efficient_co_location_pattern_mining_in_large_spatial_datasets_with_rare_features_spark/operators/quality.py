"""Repetition-based quality signals (Gopher-rule family).

Natural-ness filters beyond row-local stats: heavily repeated content
(boilerplate, keyword stuffing, templated spam) shows up as a high
duplicate-token fraction and as a single n-gram covering an outsized
share of the document.  These are the distributed members of the rule
set — the per-doc top n-gram needs a real aggregation, unlike the
row-local expressions in ``functions/text.py``.

Physical plan: one explode + groupBy((doc, gram)) count, then a
max(struct(count, gram)) per doc — two shuffles keyed by doc id (high
cardinality, skew-free), nothing driver-side.  All arithmetic is
integer-derived double division in a fixed operation order so a DuckDB
oracle reproduces the values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def repetition_stats(docs: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Per-doc repetition signals:

    - ``n_tokens``: token count (bigint)
    - ``dup_token_frac``: 1 - distinct_tokens/tokens (0.0 for empty docs)
    - ``top_gram`` / ``top_gram_count``: the most frequent word-``n``-gram
      (count ties break to the lexicographically LARGEST gram — the
      natural order of ``max(struct(count, gram))``) — NULL/0 for docs
      shorter than ``n`` tokens
    - ``top_gram_token_frac``: min(1, count * n / n_tokens) — the cap
      matters for self-overlapping repeats ('spam spam spam spam' has 3
      occurrences of its top bigram over 4 tokens), where the
      occurrence-count numerator would otherwise exceed the Gopher-style
      "share of tokens covered" reading
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.select("doc_id", T.tokens(F.col(text_col)).alias("t"))
    base = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.when(
            F.size("t") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct("t")).cast("double")
            / F.size("t").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )
    grams = toks.filter(F.size("t") >= n).select(
        "doc_id", F.explode(T.token_ngrams(F.col("t"), n)).alias("g")
    )
    top = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("c"), F.col("g"))).alias("m"))
        .select(
            "doc_id",
            F.col("m.g").alias("top_gram"),
            F.col("m.c").cast("long").alias("top_gram_count"),
        )
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "top_gram",
        F.coalesce("top_gram_count", F.lit(0)).cast("long").alias("top_gram_count"),
        F.when(
            F.col("n_tokens") > 0,
            F.least(
                F.lit(1.0),
                F.coalesce("top_gram_count", F.lit(0)).cast("double")
                * F.lit(float(n))
                / F.col("n_tokens").cast("double"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_gram_token_frac"),
    )
