from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# Point the snapshot-backed oracles at this run's scale factor (the driver
# contract defaults to sf0.01; __spark_entry__.oracle_sql reads this env).
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", os.path.basename(SF_DIR.rstrip("/")))


@pytest.fixture(scope="session")
def spark():
    from relation_extraction_using_llms_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
