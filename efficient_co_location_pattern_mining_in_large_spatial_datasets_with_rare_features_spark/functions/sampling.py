"""Deterministic sampling / split assignment for training-data pipelines.

A 100 TB corpus needs train/val/test splits that are (a) reproducible
across reruns and engines, (b) computable row-locally with no shuffle,
and (c) stable under re-partitioning — which rules out ``rand()`` and
Spark's ``sample``.  The standard answer is a content-keyed hash bucket:
``bucket = H(key) mod N`` decided per row by a pure expression.

The hash is the md5-prefix integer also used by simhash's token hash
(operators/dedup.py::token_hash60) rather than ``xxhash64``, because
every SQL engine reproduces md5 bit-for-bit — the split assignment can
therefore be verified by a DuckDB oracle and recomputed by any
downstream consumer without Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): md5-prefix integer mod N.

    The 60-bit prefix keeps the value positive and exactly representable,
    so ``%`` agrees across engines with no sign-semantics traps.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % F.lit(buckets)).cast("int")


def split_assign(
    key: Column,
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
) -> Column:
    """'train' / 'val' / 'test' label from the key's hash bucket.

    Boundaries are bucket counts out of ``buckets`` (defaults 80/10/10).
    Membership is a pure function of the key: adding or removing OTHER
    rows never moves a row between splits (the property random sampling
    lacks and dataset curation needs).
    """
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= buckets):
        raise ValueError(
            f"invalid split: train={train_pct} val={val_pct} buckets={buckets}"
        )
    b = hash_bucket(key, buckets)
    return (
        F.when(b < F.lit(train_pct), F.lit("train"))
        .when(b < F.lit(train_pct + val_pct), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_keep(
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = 1_000_000,
) -> Column:
    """Deterministic per-stratum downsampling (corpus mixture weights).

    Keeps a row iff its hash bucket falls under ``round(rate * buckets)``
    (round-half-even, i.e. Python ``round``; NOT ``int(...)`` truncation,
    which float error turns into an off-by-one — 0.29 * 1_000_000
    float-truncates to 289_999) for the row's stratum — the standard way
    a pipeline rebalances a
    mixture (e.g. downsample boilerplate-heavy languages) while staying
    reproducible and shuffle-free: membership is a pure function of
    ``(key, stratum)``, so re-partitioning, re-running, or adding other
    rows never flips a decision (the property ``df.sample`` lacks).

    The hash stream is domain-separated from ``split_assign`` by a
    ``sample:`` prefix, so sampling is independent of split membership
    (a row's split never biases its keep probability).  Thresholds are
    integers computed once at plan time; the row expression is one md5 +
    one chained CASE — full codegen, SQL-oracle-reproducible.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    b = hash_bucket(F.concat(F.lit("sample:"), key.cast("string")), buckets)
    thr = F.lit(round(default_rate * buckets))
    for s, r in sorted(rates.items()):
        thr = F.when(stratum == F.lit(s), F.lit(round(r * buckets))).otherwise(thr)
    return b < thr
