from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mergermetrics_lakehouse_pipeline_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # ephemeral warehouse: a crashed run must not leave managed-table
    # directories behind for the next session's in-memory catalog to trip
    # over (LOCATION_ALREADY_EXISTS on saveAsTable)
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark("pytest", shuffle_partitions=8, warehouse_dir=str(wh))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
