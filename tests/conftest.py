from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from openfactverification_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()
