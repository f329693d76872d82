import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))          # fixtures.py
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.session import get_spark

    s = get_spark(app_name="db2ice-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
