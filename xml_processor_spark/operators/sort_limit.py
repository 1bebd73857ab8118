"""Sort / limit / top-k (SURVEY §2.F).

Determinism: every limit sits on a total order (unique tie-break key), so
the selected row set is identical across engines and across partitionings.
``q_limit_topn`` compiles to ``TakeOrderedAndProject`` (per-partition heap +
driver merge — no full sort), the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_sort_multi",
    oracle="""
        SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        FROM customer
        ORDER BY seg DESC NULLS LAST, c_acctbal ASC, c_custkey
    """,
    doc="Multi-key sort with NULLS FIRST/LAST (nulls injected via nullif).",
)
def q_sort_multi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
            "c_acctbal",
        )
        .orderBy(F.col("seg").desc_nulls_last(), F.col("c_acctbal").asc(), "c_custkey")
    )


@register(
    "q_limit_topn",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="Global top-20 by price; o_orderkey tie-break makes it a total order.",
)
def q_limit_topn(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q_topk_per_group",
    oracle="""
        SELECT p_brand, p_partkey, p_name, p_retailprice, rn
        FROM (
            SELECT p_brand, p_partkey, p_name, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part
        ) WHERE rn <= 3
    """,
    doc="Top-3 parts per brand by price (windowed top-k; shuffles once on "
        "the partition key — the scalable per-group top-k).",
)
def q_topk_per_group(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )
