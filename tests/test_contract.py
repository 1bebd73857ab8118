"""Driver-contract invariants (SURVEY §5 layer 2)."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    import __spark_entry__ as entrypoint

    df = entrypoint.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_oracle_key_has_query():
    import __spark_entry__ as entrypoint

    qs, osql = entrypoint.queries(), entrypoint.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 90


def test_oracle_sql_parses_in_duckdb():
    """Every oracle statement must at least plan against empty views."""
    import __spark_entry__ as entrypoint
    from xml_processor_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    for key, sql in entrypoint.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")  # raises on any syntax/name error


def test_queries_have_aliased_columns(spark):
    """No generated column names (the driver hashes by sorted names)."""
    import __spark_entry__ as entrypoint

    bad_fragments = ("(", ")", " ", "#")
    for key, fn in entrypoint.queries().items():
        cols = fn(spark, SF_SMALL).columns
        for c in cols:
            assert not any(b in c for b in bad_fragments), f"{key}: bad col {c!r}"
