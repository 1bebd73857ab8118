"""Two-sample hypothesis tests over order facts (SURVEY §2.L extension).

The drift-gate layer of a production pipeline: before a new data drop is
merged, its value distribution is tested against the reference slice, and
the merge is blocked when the statistic crosses a threshold. Both operators
follow the house scale rules:

- **aggregate first**: the fact table collapses to per-group moments or a
  bounded bin histogram in ONE map-side-combined shuffle; the statistic is
  closed-form arithmetic over that bounded result, never a row-level sort.
- **exact-integer internals**: means/variances come from BIGINT cent sums
  and decimal(38,0) squared-cent sums; the KS gap is maximized over the
  EXACT integer cross-product ``|cum_a·n_b − cum_b·n_a|`` so the argmax bin
  is engine-independent (no float comparison decides a winner); floats
  appear only in the final division, rounded to 6 dp.

A full-sort two-sample KS needs a global order over both samples — a
single-partition window at 100 TB. The binned variant quantizes values to a
calendar of ~50 fixed price bins first, so the cumulative scan runs over a
bounded histogram; the bin width is the resolution limit of the reported D
and is part of the operator's declared semantics (the same trade every
monitoring system makes: ddsketch/t-digest quantiles, not exact ranks).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import cents, cents_sql
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_D38 = "decimal(38,0)"

# Group split shared by both tests: urgent-ish orders (priority 1 or 2)
# vs the rest — a realistic "new slice vs reference" partition with both
# sides fact-sized (neither side may be assumed broadcastable).
_GRP_SQL = "CASE WHEN o_orderpriority <= '2-HIGH' THEN 'hi' ELSE 'lo' END"


@register(
    "q_orders_welch_ttest",
    oracle=f"""
        WITH g AS (
            SELECT {_GRP_SQL} AS grp,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum({cents_sql('o_totalprice')}) AS DECIMAL(38,0))
                       AS s1,
                   CAST(sum(CAST({cents_sql('o_totalprice')} AS DECIMAL(38,0))
                            * {cents_sql('o_totalprice')}) AS DECIMAL(38,0))
                       AS s2
            FROM orders GROUP BY 1
        ), m AS (
            SELECT grp, n,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
                   (CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) / 10000.0 AS var
            FROM g
        ), w AS (
            SELECT
                max(CASE WHEN grp = 'hi' THEN n END) AS n_hi,
                max(CASE WHEN grp = 'lo' THEN n END) AS n_lo,
                max(CASE WHEN grp = 'hi' THEN mean END) AS mean_hi,
                max(CASE WHEN grp = 'lo' THEN mean END) AS mean_lo,
                max(CASE WHEN grp = 'hi' THEN var END) AS var_hi,
                max(CASE WHEN grp = 'lo' THEN var END) AS var_lo
            FROM m
        )
        SELECT n_hi, n_lo,
               round(mean_hi, 6) AS mean_hi, round(mean_lo, 6) AS mean_lo,
               round((mean_hi - mean_lo)
                     / sqrt(var_hi / n_hi + var_lo / n_lo), 6) AS t_stat,
               round(
                   (var_hi / n_hi + var_lo / n_lo)
                   * (var_hi / n_hi + var_lo / n_lo)
                   / ((var_hi / n_hi) * (var_hi / n_hi) / (n_hi - 1)
                      + (var_lo / n_lo) * (var_lo / n_lo) / (n_lo - 1)),
                   6) AS welch_df
        FROM w
    """,
    doc="Welch's unequal-variance t-test between the urgent (priority ≤ "
        "2-HIGH) and normal order-price populations: per-group mean and "
        "sample variance from exact integer-cents sums (Σx in BIGINT "
        "cents, Σx² in decimal(38,0) cents² — 5e7² × 1.5e8 rows overflows "
        "int64 at SF100, decimal does not), then the closed-form t "
        "statistic and Welch–Satterthwaite df. Scale shape: ONE "
        "map-side-combined 2-group aggregate over the fact scan; the "
        "statistic is driver-free arithmetic on a 2-row result. The "
        "identical double expression tree runs in both engines, so 6-dp "
        "rounding absorbs any libm residue.",
)
def q_orders_welch_ttest(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    grp = F.when(
        F.col("o_orderpriority") <= "2-HIGH", F.lit("hi")
    ).otherwise(F.lit("lo"))
    c = cents("o_totalprice")
    g = o.select(grp.alias("grp"), c.alias("c")).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast(_D38).alias("s1"),
        F.sum(F.col("c").cast(_D38) * F.col("c")).cast(_D38).alias("s2"),
    )
    nd = F.col("n").cast("double")
    m = g.select(
        "grp",
        "n",
        (F.col("s1").cast("double") / nd / 100.0).alias("mean"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
            )
            / (nd - 1.0)
            / 10000.0
        ).alias("var"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == "hi", F.col("n"))).alias("n_hi"),
        F.max(F.when(F.col("grp") == "lo", F.col("n"))).alias("n_lo"),
        F.max(F.when(F.col("grp") == "hi", F.col("mean"))).alias("mean_hi"),
        F.max(F.when(F.col("grp") == "lo", F.col("mean"))).alias("mean_lo"),
        F.max(F.when(F.col("grp") == "hi", F.col("var"))).alias("var_hi"),
        F.max(F.when(F.col("grp") == "lo", F.col("var"))).alias("var_lo"),
    )
    se_hi = F.col("var_hi") / F.col("n_hi")
    se_lo = F.col("var_lo") / F.col("n_lo")
    se2 = se_hi + se_lo
    return w.select(
        "n_hi",
        "n_lo",
        F.round("mean_hi", 6).alias("mean_hi"),
        F.round("mean_lo", 6).alias("mean_lo"),
        F.round(
            (F.col("mean_hi") - F.col("mean_lo")) / F.sqrt(se2), 6
        ).alias("t_stat"),
        F.round(
            se2 * se2
            / (
                se_hi * se_hi / (F.col("n_hi") - 1)
                + se_lo * se_lo / (F.col("n_lo") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# KS bins: o_totalprice spans ~[900, 500k); 10k-wide bins give ~50 buckets,
# clamped so the histogram is calendar-bounded at ANY scale factor.
_KS_BIN_W = 10_000
_KS_BIN_MAX = 50


@register(
    "q_orders_ks_binned",
    oracle=f"""
        WITH b AS (
            SELECT {_GRP_SQL} AS grp,
                   least(CAST(floor(o_totalprice / {_KS_BIN_W}) AS BIGINT),
                         {_KS_BIN_MAX}) AS bin
            FROM orders
        ), h AS (
            SELECT grp, bin, CAST(count(*) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2
        ), p AS (
            SELECT bin,
                   coalesce(max(CASE WHEN grp = 'hi' THEN cnt END), 0)
                       AS cnt_hi,
                   coalesce(max(CASE WHEN grp = 'lo' THEN cnt END), 0)
                       AS cnt_lo
            FROM h GROUP BY 1
        ), c AS (
            SELECT bin,
                   sum(cnt_hi) OVER (ORDER BY bin) AS cum_hi,
                   sum(cnt_lo) OVER (ORDER BY bin) AS cum_lo,
                   sum(cnt_hi) OVER () AS n_hi,
                   sum(cnt_lo) OVER () AS n_lo
            FROM p
        ), gaps AS (
            SELECT bin, n_hi, n_lo,
                   abs(cum_hi * n_lo - cum_lo * n_hi) AS gap_x
            FROM c
        )
        SELECT CAST(max(n_hi) AS BIGINT) AS n_hi,
               CAST(max(n_lo) AS BIGINT) AS n_lo,
               CAST(min(CASE WHEN gap_x = mg THEN bin END) AS BIGINT)
                   AS at_bin,
               round(CAST(max(gap_x) AS DOUBLE)
                     / CAST(max(n_hi) AS DOUBLE)
                     / CAST(max(n_lo) AS DOUBLE), 6) AS ks_d
        FROM gaps, (SELECT max(gap_x) AS mg FROM gaps) t
    """,
    doc=f"Binned two-sample Kolmogorov–Smirnov distance between the urgent "
        "and normal order-price distributions: values quantized to "
        f"{_KS_BIN_W}-wide price bins (≤ {_KS_BIN_MAX + 1} buckets at any "
        "SF), per-bin counts in one map-side-combined shuffle, then "
        "D = max |ECDF_hi − ECDF_lo| over the bounded histogram. The gap "
        "is maximized as the EXACT integer |cum_hi·n_lo − cum_lo·n_hi| "
        "(ties broken toward the smaller bin), so no float comparison "
        "ever picks the argmax. Scale shape: the only unbounded-input "
        "stage is the histogram aggregate; the cumulative window runs "
        "over ≤ 51 rows. A full-sort KS would need a global rank over "
        "both samples — the binned form is the one that survives 100 TB, "
        "with bin width as the declared resolution of D.",
)
def q_orders_ks_binned(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    grp = F.when(
        F.col("o_orderpriority") <= "2-HIGH", F.lit("hi")
    ).otherwise(F.lit("lo"))
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / _KS_BIN_W).cast("long"),
        F.lit(_KS_BIN_MAX).cast("long"),
    )
    h = (
        o.select(grp.alias("grp"), bin_.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p = h.groupBy("bin").agg(
        F.coalesce(
            F.max(F.when(F.col("grp") == "hi", F.col("cnt"))), F.lit(0)
        ).alias("cnt_hi"),
        F.coalesce(
            F.max(F.when(F.col("grp") == "lo", F.col("cnt"))), F.lit(0)
        ).alias("cnt_lo"),
    )
    # ≤ 51 rows from here on: single-partition windows over the bounded
    # histogram are the intended plan, not a scale hazard.
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = p.select(
        "bin",
        F.sum("cnt_hi").over(wc).alias("cum_hi"),
        F.sum("cnt_lo").over(wc).alias("cum_lo"),
        F.sum("cnt_hi").over(wall).alias("n_hi"),
        F.sum("cnt_lo").over(wall).alias("n_lo"),
    )
    # decimal(38,0) cross-multiplication: int64 would overflow once each
    # sample exceeds ~3e9 rows (100 TB ~ 1.5e11 orders); DuckDB's window
    # sums promote to HUGEINT, so the exact-integer argmax must match.
    gaps = c.select(
        "bin",
        "n_hi",
        "n_lo",
        F.abs(
            F.col("cum_hi").cast(_D38) * F.col("n_lo").cast(_D38)
            - F.col("cum_lo").cast(_D38) * F.col("n_hi").cast(_D38)
        ).alias("gap_x"),
    ).withColumn("mg", F.max("gap_x").over(wall))
    return gaps.agg(
        F.max("n_hi").cast("long").alias("n_hi"),
        F.max("n_lo").cast("long").alias("n_lo"),
        F.min(F.when(F.col("gap_x") == F.col("mg"), F.col("bin")))
        .cast("long")
        .alias("at_bin"),
        F.round(
            F.max("gap_x").cast("double")
            / F.max("n_hi").cast("double")
            / F.max("n_lo").cast("double"),
            6,
        ).alias("ks_d"),
    )
