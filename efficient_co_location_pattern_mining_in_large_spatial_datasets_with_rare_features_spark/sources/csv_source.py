"""Spatial-instance CSV source.

Reads the reference's CSV layout ``Feature,Instance,LocX,LocY[,Checkin]``
(reference src/data_loader.cpp:20-36) into the engine's canonical instance
DataFrame ``(feature string, id string, x double, y double)``.

Differences from the reference, by design:

- Extra columns (``Checkin``) are pruned by Catalyst, not read and dropped.
- Headers ``X,Y`` are accepted as aliases for ``LocX,LocY`` (the reference
  loader throws on ``data/5k_15f_50k.csv`` because of this — SURVEY §1).
- Features of any length work; the reference silently assumes 1-char
  features (src/utils.cpp:37-43 keys the histogram on ``id.substr(0,1)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INSTANCE_SCHEMA = "feature string, id string, x double, y double"


def load_instances_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(path, header=True, inferSchema=False)
    cols = {c.lower(): c for c in raw.columns}

    def pick(*names: str) -> str:
        for n in names:
            if n in cols:
                return cols[n]
        raise ValueError(f"CSV at {path} lacks any of {names}; has {raw.columns}")

    feature = pick("feature")
    instance = pick("instance")
    locx = pick("locx", "x")
    locy = pick("locy", "y")
    return raw.select(
        F.col(feature).alias("feature"),
        # id = feature + str(int(instance)) — reference src/data_loader.cpp:28
        F.concat(F.col(feature), F.col(instance).cast("long").cast("string")).alias("id"),
        F.col(locx).cast("double").alias("x"),
        F.col(locy).cast("double").alias("y"),
    )
