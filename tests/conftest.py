import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def spark():
    from amundsendatabuilder_spark.session import get_spark
    return get_spark("tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture(scope="session")
def tables_df(spark):
    from amundsendatabuilder_spark.sources.csv_source import read_tables_with_columns
    return read_tables_with_columns(
        spark,
        os.path.join(FIXTURES, "sample_table.csv"),
        os.path.join(FIXTURES, "sample_col.csv"))
