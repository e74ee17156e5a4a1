"""Deterministic lifecycle control for ``localCheckpoint`` storage.

``DataFrame.localCheckpoint`` persists the materialized RDD, and Spark
only releases those blocks when the ContextCleaner happens to GC the RDD
reference — nondeterministic in a long-lived session, so iterative
operators that checkpoint per round (CC contraction, kNN widening) would
pin executor storage for the life of the session.  ``unpersist_ckpt``
releases a checkpoint's blocks eagerly via the ``LogicalRDD`` handle in
its analyzed plan.

Only call it on frames provably NOT referenced by any plan that may
still execute: a localCheckpoint's lineage is truncated, so reading after
unpersist raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than
recomputing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpersist_ckpt(ck: DataFrame) -> None:
    """Best-effort eager release of a ``localCheckpoint``'s storage blocks."""
    try:
        ck._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort on plan-shape changes
        pass
