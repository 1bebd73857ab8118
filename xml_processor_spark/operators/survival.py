"""Customer survival / lifetime analytics (SURVEY §2.L/M extension).

The retention layer a subscription/commerce warehouse runs weekly:

- `q_cust_kaplan_meier` — the Kaplan–Meier estimator of time-to-second
  order (repeat-purchase latency), with one-order customers right-censored
  at the corpus high-water mark. KM is THE standard estimator under
  censoring — a naive "average days to second order over repeaters"
  systematically underestimates latency because slow repeaters are still
  censored.
- `q_cust_lifetime` — per-segment lifetime value summary (tenure, order
  frequency, revenue per customer, repeat rate): the denominator table
  every CLV model starts from.

House scale rules:

- **aggregate first**: both collapse the orders fact onto per-customer
  rows with keyed aggregates (shuffle on custkey — the natural key), then
  onto a bounded structure (≤37 monthly KM buckets, ≤5 segments).
- **exact-integer internals**: durations are exact day diffs bucketed by
  integer division; at-risk/event/censor counts are BIGINTs; revenue in
  exact cents. The ONLY float chain is the KM product itself, computed as
  exp(Σ ln((n−d)/n)) over the ≤37-bucket table — the identical expression
  tree in both engines, 6-dp rounded (the Welch precedent), with the
  d = n absorbing state guarded INSIDE the windowed sum (ln evaluates
  only when n > d) and the reported 0.0 owned by the min-factor flag.

Reference surface: none — CORE extensions mandated by the BASELINE.json
analytics scope (same justification as the cohort/retention family in
`analytics.py`).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

# Month buckets: exact day-diff DIV 30, capped — the declared resolution
# of the survival curve (≤37 rows at ANY SF).
_BUCKET_DAYS = 30
_BUCKET_MAX = 36


@register(
    "q_cust_kaplan_meier",
    oracle=f"""
        WITH f AS (
            SELECT o_custkey, min(o_orderdate) AS t0
            FROM orders GROUP BY 1
        ), s AS (
            SELECT o.o_custkey, min(o.o_orderdate) AS t1
            FROM orders o JOIN f ON o.o_custkey = f.o_custkey
                              AND o.o_orderdate > f.t0
            GROUP BY 1
        ), hw AS (SELECT max(o_orderdate) AS hi FROM orders),
        g AS (
            SELECT least(CAST(date_diff('day', f.t0,
                                        coalesce(s.t1, hw.hi))
                              AS BIGINT) // {_BUCKET_DAYS},
                         {_BUCKET_MAX}) AS t,
                   CASE WHEN s.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM f LEFT JOIN s ON f.o_custkey = s.o_custkey
            CROSS JOIN hw
        ), km AS (
            SELECT t,
                   CAST(coalesce(sum(ev), 0) AS BIGINT) AS d,
                   CAST(coalesce(sum(1 - ev), 0) AS BIGINT) AS c
            FROM g GROUP BY 1
        ), r AS (
            SELECT t, d, c,
                   CAST(sum(d + c) OVER (ORDER BY t ROWS BETWEEN
                       UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                    - coalesce(sum(d + c) OVER (ORDER BY t ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
            FROM km
        )
        SELECT t AS month_bucket, n_risk, d AS n_event, c AS n_censor,
               -- The ln() is guarded INSIDE the windowed sum: window
               -- functions evaluate before the outer CASE projection, so
               -- an unguarded ln((n-d)/n) would evaluate ln(0) on an
               -- absorbing d = n bucket (DuckDB runtime error; Spark
               -- NULL silently skipped by sum) regardless of the outer
               -- flag (ADVICE r8). The outer min-factor flag still owns
               -- the reported 0.0 survival value.
               CASE WHEN min(CAST(n_risk - d AS DOUBLE)
                            / CAST(n_risk AS DOUBLE)) OVER (
                        ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) = 0.0
                    THEN 0.0
                    ELSE round(exp(sum(CASE WHEN n_risk > d
                                  THEN ln(CAST(n_risk - d AS DOUBLE)
                                          / CAST(n_risk AS DOUBLE))
                                  ELSE 0.0 END) OVER (
                             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW)), 6)
               END AS survival
        FROM r
    """,
    doc="Kaplan–Meier curve of repeat-purchase latency: per customer, "
        "time from first order to second distinct order DATE (same-day "
        "repeats are declared part of the first purchase event); "
        "customers with no second order are right-censored at the corpus "
        "high-water mark — KM is the standard estimator that a naive "
        "repeaters-only mean gets wrong under censoring. Durations are "
        f"exact day diffs DIV {_BUCKET_DAYS}, capped at bucket "
        f"{_BUCKET_MAX} (the declared resolution). At-risk counts come "
        "from the reverse-cumulative exact-integer window; the survival "
        "product is exp(Σ ln((n−d)/n)) over the ≤37-bucket table — "
        "identical expression tree both engines, 6-dp rounded, with the "
        "d=n absorbing state guarded INSIDE the windowed sum (ln "
        "evaluates only when n_risk > d — window exprs run before the "
        "outer CASE, so an outer flag alone cannot prevent ln(0)) while "
        "the windowed min-factor flag owns the reported 0.0 survival. Scale shape: two keyed custkey "
        "aggregates + one custkey self-join (all shuffle on the natural "
        "key), a 1-row high-water broadcast, then every window runs over "
        "the bounded bucket table.",
)
def q_cust_kaplan_meier(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("t0"))
    s = (
        o.join(f, "o_custkey")
        .where(F.col("o_orderdate") > F.col("t0"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t1"))
    )
    hw = o.agg(F.max("o_orderdate").alias("hi"))
    g = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(hw))
        .select(
            F.least(
                (
                    F.datediff(
                        F.coalesce(F.col("t1"), F.col("hi")), F.col("t0")
                    ).cast("long")
                    / F.lit(_BUCKET_DAYS)
                ).cast("long"),
                F.lit(_BUCKET_MAX).cast("long"),
            ).alias("t"),
            F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    km = g.groupBy("t").agg(
        F.coalesce(F.sum("ev"), F.lit(0)).cast("long").alias("d"),
        F.coalesce(F.sum(1 - F.col("ev")), F.lit(0)).cast("long").alias("c"),
    )
    # <= 37 rows from here: single-partition windows are the intended plan.
    wall = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = km.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    factor = (F.col("n_risk") - F.col("d")).cast("double") / F.col(
        "n_risk"
    ).cast("double")
    return r.select(
        F.col("t").alias("month_bucket"),
        "n_risk",
        F.col("d").alias("n_event"),
        F.col("c").alias("n_censor"),
        F.when(F.min(factor).over(wcum) == 0.0, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.sum(
                        # Guarded inside the sum, mirroring the oracle: an
                        # absorbing d = n bucket must contribute exactly
                        # 0.0, not a NULL that F.sum silently skips.
                        F.when(
                            F.col("n_risk") > F.col("d"), F.log(factor)
                        ).otherwise(F.lit(0.0))
                    ).over(wcum)
                ),
                6,
            )
        )
        .alias("survival"),
    )


@register(
    "q_cust_lifetime",
    oracle="""
        WITH per AS (
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_c,
                   CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
                        AS BIGINT) AS tenure_d
            FROM orders GROUP BY 1
        )
        SELECT c.c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS n_cust,
               round(CAST(sum(p.n_orders) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS orders_per_cust,
               round(CAST(sum(p.rev_c) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) / 100.0, 2) AS rev_per_cust,
               round(CAST(sum(p.tenure_d) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS avg_tenure_days,
               round(CAST(coalesce(sum(CASE WHEN p.n_orders >= 2 THEN 1 END),
                                   0) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS repeat_rate
        FROM per p JOIN customer c ON p.o_custkey = c.c_custkey
        GROUP BY 1
    """,
    doc="Per-segment customer-lifetime summary — the denominator table "
        "every CLV model starts from: customers, orders per customer, "
        "exact-cents revenue per customer, average tenure (first→last "
        "order, exact day diffs), and repeat rate (share with ≥2 "
        "orders). All numerators are exact integer sums folded per "
        "segment; every reported ratio is ONE division at the end "
        "(6-dp / cents-to-dollars at 2 dp). Scale shape: one keyed "
        "custkey aggregate over the orders fact, one shuffle join to "
        "customer on the same key (co-partitioned — AQE reuses the "
        "exchange), one map-side-combined ≤5-row segment rollup.",
)
def q_cust_lifetime(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_c"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("long")
        .alias("tenure_d"),
    )
    j = per.join(cust, per.o_custkey == cust.c_custkey)
    nc = F.count(F.lit(1)).cast("double")
    return j.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        r6(F.sum("n_orders").cast("double") / nc).alias("orders_per_cust"),
        F.round(F.sum("rev_c").cast("double") / nc / 100.0, 2).alias(
            "rev_per_cust"
        ),
        r6(F.sum("tenure_d").cast("double") / nc).alias("avg_tenure_days"),
        r6(
            F.coalesce(
                F.sum(F.when(F.col("n_orders") >= 2, 1)), F.lit(0)
            ).cast("double")
            / nc
        ).alias("repeat_rate"),
    )
