"""Projection / filter / predicates (SURVEY §2.B).

Maps the reference's per-record Transform stage [P: CDAP XMLParser emits
projected+cast StructuredRecords] onto Catalyst expressions: every predicate
here stays inside whole-stage codegen and is pushdown-eligible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_project_alias",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    doc="Computed columns + aliases. Per-row IEEE double arithmetic is "
        "bit-identical across engines; no rounding needed.",
)
def q_project_alias(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "q_filter_compound",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        FROM lineitem
        WHERE (l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 30)
           OR (NOT (l_linestatus = 'O') AND l_discount < 0.02)
    """,
    doc="AND/OR/NOT, IN, BETWEEN.",
)
def q_filter_compound(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_returnflag").isin("A", "R")
         & F.col("l_quantity").between(10, 30))
        | (~(F.col("l_linestatus") == "O") & (F.col("l_discount") < 0.02))
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )


@register(
    "q_filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type LIKE 'PROMO%' OR regexp_matches(p_type, 'ECONOMY.*(ED|HED)$')
    """,
    doc="LIKE prefix + regex predicate (both unanchored-search semantics).",
)
def q_filter_like(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%")
        | F.col("p_type").rlike("ECONOMY.*(ED|HED)$")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q_filter_null",
    oracle="""
        SELECT c.c_custkey,
               o.o_orderkey,
               coalesce(o.o_orderstatus, 'NONE') AS status_f,
               nullif(c.c_mktsegment, 'BUILDING') AS seg_n,
               (o.o_orderkey IS NULL) AS no_order
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_orderkey IS NULL OR o.o_totalprice > 100000
    """,
    doc="isNull/isNotNull, coalesce, nullif over an outer-join result.",
)
def q_filter_null(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return (
        j.filter(F.col("o_orderkey").isNull() | (F.col("o_totalprice") > 100000))
        .select(
            "c_custkey",
            "o_orderkey",
            F.coalesce("o_orderstatus", F.lit("NONE")).alias("status_f"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_n"),
            F.col("o_orderkey").isNull().alias("no_order"),
        )
    )


@register(
    "q_case_when",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    WHEN o_orderstatus = 'F' THEN 'high_closed'
                    ELSE 'high' END AS bucket
        FROM orders
    """,
    doc="Multi-branch CASE bucketing.",
)
def q_case_when(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .when(F.col("o_orderstatus") == "F", "high_closed")
        .otherwise("high")
    )
    return o.select("o_orderkey", bucket.alias("bucket"))


@register(
    "q_distinct",
    oracle="""
        SELECT DISTINCT c.c_mktsegment, o.o_orderstatus
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc="SELECT DISTINCT segment × status pairs.",
)
def q_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderstatus")
        .distinct()
    )
