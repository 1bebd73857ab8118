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


@register(
    "q_union_by_name",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(NULL AS VARCHAR) AS o_orderpriority,
                   'v1' AS src
            FROM orders WHERE o_orderkey % 3 = 0
        ), v2 AS (
            SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
                   o_orderpriority, 'v2' AS src
            FROM orders WHERE o_orderkey % 3 <> 0
        ), u AS (
            SELECT * FROM v1 UNION ALL SELECT * FROM v2
        )
        SELECT src,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(o_totalprice) AS BIGINT) AS n_price,
               CAST(count(o_orderpriority) AS BIGINT) AS n_priority
        FROM u GROUP BY src
    """,
    doc="Schema-evolution union (the lake-format ALTER TABLE ADD COLUMN "
        "read path): two snapshots of the same table written under "
        "different schemas — v1 predates the o_orderpriority column, v2 "
        "dropped o_totalprice — are combined with "
        "unionByName(allowMissingColumns=True), which aligns columns BY "
        "NAME and null-fills the gaps (positional unionAll would "
        "mis-bind or reject). The audit row per source counts "
        "present-vs-missing cells, the check a reader runs after a "
        "schema migration. Scale shape: zero-shuffle scans + one "
        "map-side-combined 2-group aggregate.",
)
def q_union_by_name(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    v1 = (
        o.where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_totalprice", F.lit("v1").alias("src"))
    )
    v2 = (
        o.where(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey", "o_orderpriority", F.lit("v2").alias("src"))
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderpriority").alias("n_priority"),
    )
