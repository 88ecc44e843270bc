"""Every registry query with an oracle must match DuckDB at sf0.001
(the driver's t2 gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import compare, duck_connect  # noqa: E402

from mergermetrics_lakehouse_pipeline_spark import registry  # noqa: E402

registry._load_extensions()  # parametrize over ALL registries, not just core


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "q", [q for q in registry.QUERIES if q.oracle], ids=lambda q: q.name
)
def test_query_matches_oracle(q, spark, sf_dir, duck):
    sdf = q.fn(spark, sf_dir).toPandas()
    odf = duck.execute(q.oracle).fetchdf()
    ok, msg = compare(q.name, sdf, odf)
    assert ok, msg


@pytest.mark.parametrize(
    "q", [q for q in registry.QUERIES if not q.oracle], ids=lambda q: q.name
)
def test_rows_only_queries_run(q, spark, sf_dir):
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
