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


@pytest.mark.parametrize("name", sorted(n for n, q in QUERIES.items() if q.sql))
def test_oracle_has_no_hugeint_or_decimal_output(name, con):
    """The driver's value-hash is type-sensitive: DuckDB sum() over
    integers yields HUGEINT (int128) where Spark yields BIGINT — the
    single root cause of all 6 round-2 hash failures.  No oracle may
    emit HUGEINT/UHUGEINT/DECIMAL in its final SELECT; wrap integer
    aggregates in CAST(... AS BIGINT)."""
    from .oracle_harness import oracle_types

    flagged = [
        (c, t)
        for c, t in oracle_types(con, QUERIES[name].sql)
        if t.upper() in ("HUGEINT", "UHUGEINT") or t.upper().startswith("DECIMAL")
    ]
    assert not flagged, f"{name}: oracle emits driver-hash-hostile types {flagged}"


def test_harness_rejects_uncast_hugeint_oracle(spark, sf_dir, con):
    """Regression guard for the round-2 escape: the pre-fix shape of
    text_length_histogram's oracle (bare sum() -> HUGEINT) must FAIL the
    type-strict harness even though the values are numerically equal."""
    q = QUERIES["text_length_histogram"]
    uncast = q.sql.replace("CAST(sum(n_tokens) AS BIGINT)", "sum(n_tokens)")
    assert uncast != q.sql, "fixture drift: expected the CAST to exist"
    ok, msg = compare(q.spark(spark, sf_dir), con, uncast)
    assert not ok and "result types differ" in msg, msg
