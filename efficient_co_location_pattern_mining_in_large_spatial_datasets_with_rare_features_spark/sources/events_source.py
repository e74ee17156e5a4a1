"""Derive a deterministic spatial-instance table from the testdata ``events``
table.

The driver's correctness harness runs every query against TPC-H-ish parquet
tables (TESTDATA.md); none of them carries coordinates, so spatial instances
are *derived* with integer LCG arithmetic that an ANSI-SQL oracle (DuckDB)
reproduces bit-for-bit:

    feature = event_type
    id      = event_type || '#' || event_id
    x       = ((event_id * 48271  + 11) % 100000) / 100.0   -> [0, 1000)
    y       = ((event_id * 69621  + 17) % 100000) / 100.0   -> [0, 1000)

All intermediates fit comfortably in int64 (event_id <= ~10^7 at sf>=1), both
engines evaluate the same integer ops then the same exact double division, so
Spark and DuckDB agree bitwise.  See __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Neighbor distance used by all testdata-derived benchmark/correctness
#: queries. Domain is 1000x1000; at sf0.01 (10k events) this yields a few
#: neighbors per instance.
DEFAULT_D = 12.0
DEFAULT_MIN_PREV = 0.1

# Quadratic hash mod a prime: a *linear* LCG puts points on a coarse 2D
# lattice whose minimum pair distance exceeds any useful d (zero neighbor
# pairs); the i^2 term breaks the lattice.  All intermediates stay < 2^63
# for event_id <= 10^9.  CAST: Spark parses a bare `100.0` literal as
# DECIMAL(4,1); the explicit cast pins both engines to exact double division.
X_SQL = (
    "((((event_id * event_id) % 99991) * 31 + event_id * 48271 + 11) % 99991)"
    " / CAST(100 AS DOUBLE)"
)
Y_SQL = (
    "((((event_id * event_id) % 99991) * 57 + event_id * 69621 + 17) % 99991)"
    " / CAST(100 AS DOUBLE)"
)


def instances_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_type").alias("feature"),
        F.concat(F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")).alias("id"),
        F.expr(X_SQL).alias("x"),
        F.expr(Y_SQL).alias("y"),
    )


#: ANSI SQL equivalent (DuckDB view names are pre-registered by the driver).
INSTANCES_ORACLE_SQL = f"""
SELECT event_type AS feature,
       event_type || '#' || CAST(event_id AS VARCHAR) AS id,
       {X_SQL} AS x,
       {Y_SQL} AS y
FROM events
"""
