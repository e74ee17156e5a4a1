"""PySpark-native co-location pattern mining + spatial tiling engine.

A from-scratch, DataFrame-first reimplementation of the *capabilities* of the
reference repo (ordered NR-tree joinless co-location mining with the Weighted
Participation Index of Yang et al., KAIS 2021 — see SURVEY.md), built on
Spark's execution model: grid-cell equi-joins for the spatial neighbor-pair
stage, shuffle groupBy for star neighborhoods, level-wise DataFrame joins for
clique table-instance construction, and driver-side apriori candidate
management.  Plus the surrounding large-scale data-pipeline toolkit: tiling
(raster <-> vector), image-payload plumbing (Arrow-vectorized pandas UDFs),
deduplication, similarity search, and text analysis.

Import alias used throughout the repo::

    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng
"""

from .config import ColocationConfig
from .session import get_spark
from .plans.miner import ColocationMiner, MiningResult

__all__ = ["ColocationConfig", "get_spark", "ColocationMiner", "MiningResult"]

__version__ = "0.1.0"
