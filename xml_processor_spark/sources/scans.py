"""Scans — parquet source with projection/predicate pushdown (SURVEY §2.A).

The reference's XMLReader is a batch file source [P: CDAP
XMLReaderBatchSource]; our source layer is Spark's DataSource V2 parquet
reader: column pruning and predicate pushdown reach the scan automatically
(asserted in tests/test_plans.py), so a 2-column projection reads 2 columns,
not 11 — the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="Full scan + projection of region — smallest smoke.",
)
def q_scan_parquet(spark, sf_dir):
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "q_scan_pruned",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 30 AND l_discount > 0.05
    """,
    doc="Column-pruned, predicate-pushed scan of lineitem; the pushdown is "
        "asserted on the physical plan in tests/test_plans.py.",
)
def q_scan_pruned(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 30) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
