import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from processor_edf_spark.session import get_spark  # noqa: E402

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
REFERENCE_SAMPLES = "/root/reference/sample_data"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("processor_edf_spark_tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
