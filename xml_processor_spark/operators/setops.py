"""Set operations (SURVEY §2.G) — bag and set semantics, Spark vs ANSI.

``union`` in Spark is UNION ALL (bag); set-union is union+distinct.
``exceptAll``/``intersect`` match DuckDB's EXCEPT ALL / INTERSECT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_union_all",
    oracle="""
        SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, 'supplier' FROM supplier
    """,
    doc="Bag union of two conforming projections.",
)
def q_union_all(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionAll(s)


@register(
    "q_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
    doc="Set union (union + distinct).",
)
def q_union_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_intersect",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Set intersect: customers holding both an F and an O order.",
)
def q_intersect(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust)


@register(
    "q_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders
    """,
    doc="Set difference: customers with no orders.",
)
def q_except(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o).distinct()


@register(
    "q_except_all",
    oracle="""
        SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity < 25
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    doc="Bag difference with multiplicity semantics.",
)
def q_except_all(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 25).select(F.col("l_orderkey").alias("okey"))
    b = li.filter(F.col("l_returnflag") == "A").select(F.col("l_orderkey").alias("okey"))
    return a.exceptAll(b)
