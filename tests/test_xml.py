"""XML envelope edge cases (SURVEY §5 — beyond what the oracle sees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from xml_processor_spark.io import table


def test_corrupt_route_is_exactly_ten_percent(spark, queries):
    rows = queries["q_xml_corrupt_route"](spark, SF_SMALL).collect()
    o = table(spark, SF_SMALL, "orders")
    want_corrupt = o.filter(F.col("o_orderkey") % 10 == 0).count()
    assert sum(r.n_corrupt for r in rows) == want_corrupt
    assert sum(r.n_corrupt + r.n_ok for r in rows) == o.count()


def test_nested_explode_roundtrips_every_lineitem(spark, queries):
    got = queries["q_xml_nested_explode"](spark, SF_SMALL)
    li = table(spark, SF_SMALL, "lineitem")
    assert got.count() == li.count()
    # spot-check one order's lines
    got_lines = {
        (r.ln, r.qty_c)
        for r in got.filter(F.col("okey") == 7).collect()
    }
    want_lines = {
        (r.l_linenumber, int(round(r.l_quantity * 100)))
        for r in li.filter(F.col("l_orderkey") == 7).collect()
    }
    assert got_lines == want_lines


def test_xml_source_parses_all_rows(spark, queries):
    df = queries["E-XML-SRC"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == 200
    assert all(r.fileName.endswith(".txt") for r in rows)
    assert len({r.fileName for r in rows}) == 2  # two files, tracked per-file


def test_empty_input_parses_to_empty(spark):
    """Empty XML input → empty typed output (no crash, schema preserved)."""
    empty = spark.createDataFrame([], "xml STRING")
    parsed = empty.select(F.from_xml("xml", "okey LONG").alias("p")).select("p.okey")
    assert parsed.count() == 0
    assert parsed.columns == ["okey"]


def test_from_xml_all_null_group(spark):
    """All-corrupt input yields all-null fields, not errors (PERMISSIVE)."""
    bad = spark.createDataFrame([("<o><k>",), ("notxml",)], "xml STRING")
    parsed = bad.select(F.from_xml("xml", "k LONG", {"mode": "PERMISSIVE"}).alias("p"))
    rows = parsed.select("p.k").collect()
    assert [r.k for r in rows] == [None, None]
