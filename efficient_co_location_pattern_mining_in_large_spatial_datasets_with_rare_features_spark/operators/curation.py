"""Skew-safe per-group top-k selection for corpus curation.

The curation shape every training-data pipeline runs — "keep the best k
documents per language / source / domain" — is a one-liner with
``row_number().over(Window.partitionBy(group))``, but that plan is a
scale-killer when the group key has low cardinality: with ~6 languages,
the whole corpus funnels through six reducer tasks regardless of
cluster size.  At 10^11 docs that single stage IS the job.

``topk_per_group`` runs the standard two-phase (salted) top-k instead:

1. rank within ``(group, salt)`` and keep ``rank <= k`` — parallelism is
   ``num_salts × |groups|`` and at most ``num_salts * k`` rows per group
   survive;
2. re-rank the survivors within ``group`` and keep ``rank <= k``.

Phase 2 still partitions by the low-cardinality group key, but its input
is bounded by ``num_salts * k * |groups|`` rows — driver-trivial — so the
skew is harmless.  The output is invariant to the salt assignment: every
row of the true global top-k ranks ≤ k inside whatever salted sub-group
it lands in, so phase 1 can never drop it, and phase 2's ranking only
sees order-irrelevant extras.  The salt is therefore allowed to be
partitioning-dependent (``spark_partition_id``), which costs zero
compute and no extra hash.

``order_by`` must be a total order (include a unique tiebreaker such as
the document id) for ``row_number`` to be deterministic — the same
requirement the naive single-window plan has.

Interaction with Spark's own optimizer: since 3.5, a ``rank <= k``
filter directly above a window inserts ``WindowGroupLimit`` with a
*Partial* pass before the exchange (visible in both phases' plans
here), which already caps what each reducer receives at
``input_partitions * k`` rows per group.  The salted plan composes with
it rather than replacing it: phase 1 restores *parallelism* (the
partial pass bounds reducer input but still runs the final rank of a
6-value key on 6 tasks), and keeps the guarantee when the pattern
breaks WindowGroupLimit (any projection/filter between window and rank
filter, or rank functions it doesn't cover).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SALT = "__tk_salt"


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    num_salts: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by``, skew-safe.

    Returns ``df``'s columns plus ``rank_col`` (bigint, 1-based rank
    within the group).  Output-identical to the naive
    ``row_number().over(Window.partitionBy(*group_cols).orderBy(*order_by))
    .filter(rank <= k)`` plan for any ``num_salts >= 1``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if num_salts < 1:
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    for taken in (_SALT, rank_col):
        if taken in df.columns:
            raise ValueError(
                f"input already has a column named {taken!r}; rename it "
                "(or pass a different rank_col) — topk_per_group would "
                "silently clobber it"
            )
    order_by = list(order_by)
    group_cols = list(group_cols)

    # skinny-input rule (ADVICE r05; see operators/pairs.py): the salt is
    # partition-derived, so on a one-file parquet input (1 partition) it
    # would be CONSTANT and phase 1 silently degenerates to the exact
    # single-reducer window this operator exists to avoid.  Output stays
    # correct either way; the repartition restores the de-skew.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(parallelism, num_salts):
        df = df.repartition(parallelism)

    salted = df.withColumn(_SALT, F.spark_partition_id() % F.lit(num_salts))
    w1 = Window.partitionBy(*group_cols, _SALT).orderBy(*order_by)
    survivors = (
        salted.withColumn(rank_col, F.row_number().over(w1))
        .filter(F.col(rank_col) <= k)
        .drop(_SALT, rank_col)
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
