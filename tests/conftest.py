import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark as eng  # noqa: E402

REFDATA = "/root/reference/data"
TESTDATA_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = eng.get_spark(
        os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        app_name="engine-tests",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8")),
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sample_instances(spark):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark.sources.csv_source import (
        load_instances_csv,
    )

    return load_instances_csv(spark, f"{REFDATA}/sample_data.csv").persist()
