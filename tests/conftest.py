import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from etly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etly-spark-tests")
    yield s


# Shared plan-gate pattern (test_plans.py + test_prefix.py): a Window
# whose ONLY partition key is a given column. In the formatted plan a
# window spec prints as windowspecdefinition(<partition cols>, <order
# specs>, frame); a single-key partition shows the key followed
# directly by an order spec (`... ASC/DESC`) or the frame. Kept in ONE
# place so a Spark plan-text change can't silently disable one of the
# two skew gates.
import re as _re


def single_key_window_re(key: str) -> "_re.Pattern[str]":
    return _re.compile(
        rf"windowspecdefinition\({key}#\d+[A-Za-z]*,\s*"
        r"(?:[^,()]+ (?:ASC|DESC)|specifiedwindowframe)"
    )
