"""Window functions (SURVEY §2.E) — ranking, offsets, frames.

Every window sits on a total order (unique tie-break keys) except
`q_win_rank_dense`, which *deliberately* orders by a tied value: rank/
dense_rank are deterministic over a tied multiset, ntile is not (it splits
ties by row position), so ntile gets the unique order.

Framed sums/averages use integer-cents arithmetic: Spark accumulates frames
sequentially while DuckDB uses segment trees — different double addition
orders, same exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import cents
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

# Shared total order for per-customer order history.
_ORD_SQL = "ORDER BY o_orderdate, o_orderkey"


def _w():
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@register(
    "q_win_rownum",
    oracle=f"""
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey {_ORD_SQL}) AS rn
        FROM orders
    """,
    doc="row_number per customer over order history.",
)
def q_win_rownum(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.row_number().over(_w()).cast("long").alias("rn"),
    )


@register(
    "q_win_rank_dense",
    oracle="""
        SELECT o_orderkey, o_orderstatus, price_k,
               rank() OVER (PARTITION BY o_orderstatus ORDER BY price_k DESC) AS rnk,
               dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY price_k DESC) AS drnk
        FROM (SELECT o_orderkey, o_orderstatus,
                     CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_k
              FROM orders)
    """,
    doc="rank/dense_rank over deliberately tied values (price bucketed to "
        "10k) — rank output is deterministic over ties, row order is not.",
)
def q_win_rank_dense(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.floor(F.col("o_totalprice") / 10000).cast("long").alias("price_k"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("price_k").desc())
    return o.select(
        "o_orderkey", "o_orderstatus", "price_k",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="ntile/percent_rank/cume_dist on a unique total order (ntile splits "
        "ties positionally, so the order must be total).",
)
def q_win_ntile_pct(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_win_lag_lead",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey {_ORD_SQL}) AS prev_price,
               lead(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey {_ORD_SQL}) AS next_price,
               date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey {_ORD_SQL}),
                   o_orderdate) AS gap_days
        FROM orders
    """,
    doc="lag/lead with defaults + day gap between consecutive orders.",
)
def q_win_lag_lead(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = _w()
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice", 1, 0.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long").alias("gap_days"),
    )


@register(
    "q_win_running",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_custkey {_ORD_SQL}
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
                   AS running_spend
        FROM orders
    """,
    doc="Running total per customer (exact cents; frame-order-independent).",
)
def q_win_running(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100)
        .alias("running_spend"),
    )


@register(
    "q_win_moving",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_custkey {_ORD_SQL}
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / (100 * COUNT(*) OVER (PARTITION BY o_custkey {_ORD_SQL}
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
                   AS moving_avg
        FROM orders
    """,
    doc="4-row moving average (exact cents / frame count).",
)
def q_win_moving(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = _w().rowsBetween(-3, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        (
            F.sum(cents("o_totalprice")).over(w).cast("double")
            / (100 * F.count(F.lit(1)).over(w))
        ).alias("moving_avg"),
    )


@register(
    "q_win_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                         RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cents
        FROM orders
    """,
    doc="Value-range frame: cents of all same-customer orders within "
        "$50k below the current order's price.",
)
def q_win_range_frame(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.sum(cents("o_totalprice")).over(w).alias("near_cents"),
    )


@register(
    "q_win_first_last",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER (PARTITION BY o_custkey {_ORD_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
               last_value(o_orderkey) OVER (PARTITION BY o_custkey {_ORD_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        FROM orders
    """,
    doc="first_value/last_value with an explicit full-partition frame "
        "(the default frame would make last_value = current row).",
)
def q_win_first_last(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = _w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@register(
    "q_win_nth_value",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey {_ORD_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_order,
               nth_value(o_orderkey, 3) OVER (PARTITION BY o_custkey {_ORD_SQL}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS third_order
        FROM orders
    """,
    doc="nth_value with the explicit full-partition frame (same frame "
        "discipline as first/last): the customer's 2nd and 3rd order by "
        "the deterministic (date, key) total order; NULL when the "
        "partition is shorter. Shares the one (custkey) Exchange with "
        "every other window in this module.",
)
def q_win_nth_value(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = _w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
    )
