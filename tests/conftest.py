import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thoth_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("THOTH_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="thoth_spark_tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def events_df(spark, sf_dir):
    from thoth_spark.sources import load_table

    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="session")
def documents_df(spark, sf_dir):
    from thoth_spark.sources import load_table

    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="session")
def embeddings_df(spark, sf_dir):
    from thoth_spark.sources import load_table

    return load_table(spark, sf_dir, "embeddings").cache()
