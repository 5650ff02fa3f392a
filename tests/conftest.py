from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from claim_analysis_engine_spark.session import get_spark  # noqa: E402

SF_SMALL = os.environ.get("CAE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("CAE_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cae-tests", shuffle_partitions=8)
    yield s
    s.stop()
