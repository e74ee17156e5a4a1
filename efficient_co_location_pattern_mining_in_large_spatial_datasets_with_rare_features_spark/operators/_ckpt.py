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

import warnings

from pyspark.sql import DataFrame

_warned = False


def unpersist_ckpt(ck: DataFrame) -> None:
    """Best-effort eager release of a ``localCheckpoint``'s storage blocks.

    Reaches through py4j to the analyzed plan's RDD, so a Spark upgrade
    that changes the plan shape can break it; when that happens we warn
    once per session instead of failing — iteration still works, but
    checkpoint blocks then pin storage until the ContextCleaner GCs
    them, which is worth a visible signal rather than a silent
    regression.
    """
    global _warned
    try:
        ck._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as e:  # noqa: BLE001 — best-effort on plan-shape changes
        if not _warned:
            _warned = True
            warnings.warn(
                "unpersist_ckpt: eager checkpoint release failed "
                f"({type(e).__name__}: {e}); falling back to ContextCleaner "
                "GC — executor storage may stay pinned between rounds",
                RuntimeWarning,
                stacklevel=2,
            )
