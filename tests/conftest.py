import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from etly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etly-spark-tests")
    yield s
