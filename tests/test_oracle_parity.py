"""Every registered query with an oracle must match DuckDB at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from fitness_data_ingest_spark.registry import all_queries

from .oracle_harness import compare, duck_con

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(df, con, q.sql)
    assert ok, f"{name}: {msg}"
