"""K-sample comparison & association strength tests (SURVEY §2.L/M ext).

`hypothesis.py` (Welch t, binned KS) and `robust.py` (Mann–Whitney,
Spearman, Theil–Sen, runs) cover the TWO-sample drift gates; this module
completes the family with the K-sample omnibus layer a release monitor
needs when the slice key has more than two levels (the 5 order
priorities, the 5 market segments):

- `q_orders_anova` — one-way ANOVA F across the 5 priority classes.
- `q_orders_kruskal` — its rank-based twin (Kruskal–Wallis H with tie
  correction) over the same bounded price histogram as q_orders_ks_binned.
- `q_orders_cramers_v` — omnibus chi² + Cramér's V effect size for the
  segment × priority contingency (q_orders_chi2 is the per-cell
  drilldown; this is the single-number gate with the fact-fact join).
- `q_orders_two_proportion` — pooled two-proportion z-test (urgent-order
  share, BUILDING segment vs rest), the simplest and most common A/B gate.

House scale rules, same as the sibling modules:

- **aggregate first**: every test collapses the fact scan onto a bounded
  structure (≤5 group moments, ≤51-bin histogram, ≤5×5 contingency) in
  ONE map-side-combined shuffle; the statistic is closed-form arithmetic
  over that bounded result.
- **exact-integer internals**: counts in BIGINT, cent sums and squared
  cent sums in decimal(38,0) (Σx² overflows int64 at ~3e9 rows), rank
  sums ×2 via the midrank identity 2·cum_before + tot + 1. Floats appear
  only in the final closed forms, rounded to 6 dp over IDENTICAL
  expression trees in both engines (the Welch precedent).

Reference surface: none — CORE extensions mandated by the BASELINE.json
analytics scope, same justification as hypothesis.py / robust.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import cents, cents_sql, r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_D38 = "decimal(38,0)"

# Same ~50-bin price histogram as q_orders_ks_binned / q_orders_mannwhitney:
# the declared rank resolution of every binned rank test in this repo.
_BIN_W = 10_000
_BIN_MAX = 50


@register(
    "q_orders_anova",
    oracle=f"""
        WITH g AS (
            SELECT o_orderpriority AS grp,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum({cents_sql('o_totalprice')}) AS DECIMAL(38,0))
                       AS s1,
                   CAST(sum(CAST({cents_sql('o_totalprice')} AS DECIMAL(38,0))
                            * {cents_sql('o_totalprice')}) AS DECIMAL(38,0))
                       AS s2
            FROM orders GROUP BY 1
        ), t AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(s1) AS DOUBLE) AS s1d,
                   CAST(sum(s2) AS DOUBLE) AS s2d,
                   sum(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE)) AS sb
            FROM g
        )
        SELECT k,
               nn AS n,
               CAST(k - 1 AS BIGINT) AS df_between,
               CAST(nn - k AS BIGINT) AS df_within,
               round(((sb - s1d * s1d / CAST(nn AS DOUBLE))
                      / CAST(k - 1 AS DOUBLE))
                     / ((s2d - sb) / CAST(nn - k AS DOUBLE)), 6) AS f_stat,
               round((sb - s1d * s1d / CAST(nn AS DOUBLE))
                     / (s2d - s1d * s1d / CAST(nn AS DOUBLE)), 6) AS eta_sq
        FROM t
    """,
    doc="One-way ANOVA of order price across the 5 priority classes: "
        "per-group (n, Σcents, Σcents²) with the squared sums in "
        "decimal(38,0) (5e7² cents² × 3e10 rows/group at 100 TB is 1e26 "
        "— int64 is hopeless), then the classical decomposition "
        "SSB = Σs1_g²/n_g − S1²/N, SSW = S2 − Σs1_g²/n_g computed once "
        "in doubles over the ≤5-row group table. F = (SSB/df1)/(SSW/df2) "
        "and the η² effect size share one 6-dp-rounded expression tree "
        "in both engines; the cents² unit cancels in both ratios so no "
        "unit conversion ever touches the floats. Scale shape: ONE "
        "map-side-combined 5-group aggregate over the fact scan; the "
        "statistic is a 1-row fold of a 5-row result.",
)
def q_orders_anova(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    g = o.select(
        F.col("o_orderpriority").alias("grp"), c.alias("c")
    ).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast(_D38).alias("s1"),
        F.sum(F.col("c").cast(_D38) * F.col("c")).cast(_D38).alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum(F.col("s1").cast("double")).alias("s1d"),
        F.sum(F.col("s2").cast("double")).alias("s2d"),
        F.sum(
            F.col("s1").cast("double") * F.col("s1").cast("double")
            / F.col("n").cast("double")
        ).alias("sb"),
    )
    nn_d = F.col("nn").cast("double")
    ssb = F.col("sb") - F.col("s1d") * F.col("s1d") / nn_d
    ssw = F.col("s2d") - F.col("sb")
    sst = F.col("s2d") - F.col("s1d") * F.col("s1d") / nn_d
    return t.select(
        F.col("k"),
        F.col("nn").alias("n"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("nn") - F.col("k")).cast("long").alias("df_within"),
        r6(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("nn") - F.col("k")).cast("double"))
        ).alias("f_stat"),
        r6(ssb / sst).alias("eta_sq"),
    )


@register(
    "q_orders_kruskal",
    oracle=f"""
        WITH b AS (
            SELECT o_orderpriority AS grp,
                   least(CAST(floor(o_totalprice / {_BIN_W}) AS BIGINT),
                         {_BIN_MAX}) AS bin
            FROM orders
        ), cell AS (
            SELECT grp, bin, CAST(count(*) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2
        ), bins AS (
            SELECT bin, CAST(sum(cnt) AS DECIMAL(38,0)) AS tot
            FROM cell GROUP BY 1
        ), c AS (
            SELECT bin, tot,
                   2 * CAST(coalesce(sum(tot) OVER (
                       ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS DECIMAL(38,0)) + tot + 1 AS rank2
            FROM bins
        ), rg AS (
            SELECT cell.grp,
                   CAST(sum(cell.cnt) AS DECIMAL(38,0)) AS n_g,
                   sum(CAST(cell.cnt AS DECIMAL(38,0)) * c.rank2) AS r2_g
            FROM cell JOIN c ON cell.bin = c.bin
            GROUP BY 1
        ), tie AS (
            SELECT CAST(sum(tot) AS DECIMAL(38,0)) AS nn,
                   sum(tot * tot * tot - tot) AS tie3
            FROM c
        ), s AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   sum(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                       / (4.0 * CAST(n_g AS DOUBLE))) AS sr
            FROM rg
        )
        SELECT CAST(nn AS BIGINT) AS n,
               k,
               CAST(k - 1 AS BIGINT) AS df,
               round(12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
                     * sr - 3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) AS h_stat,
               round((12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
                      * sr - 3.0 * (CAST(nn AS DOUBLE) + 1.0))
                     / (1.0 - CAST(tie3 AS DOUBLE)
                        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                           * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))),
                     6) AS h_adj
        FROM s CROSS JOIN tie
    """,
    doc="Kruskal–Wallis H across the 5 priority classes — the rank-based "
        "omnibus twin of q_orders_anova for heavy-tailed prices. Values "
        f"quantize to the shared ≤{_BIN_MAX + 1}-bucket price histogram "
        "(each bin = one big tie, handled by exact ×2 midranks "
        "2·cum_before + tot + 1); per-group rank sums and the tie term "
        "Σ(t³−t) accumulate in decimal(38,0) — t³ is 3e33 at 1.5e11 "
        "rows. H and its tie-corrected form H/(1 − Σ(t³−t)/(N³−N)) are "
        "closed-form doubles over the 5-row rank-sum table, 6-dp rounded "
        "on identical cross-engine trees. Scale shape: ONE fact shuffle "
        "onto (grp, bin) cells; the bin-total join is over ≤51 rows "
        "(broadcast); every window is post-aggregation.",
)
def q_orders_kruskal(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / _BIN_W).cast("long"),
        F.lit(_BIN_MAX).cast("long"),
    )
    cell = (
        o.select(F.col("o_orderpriority").alias("grp"), bin_.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bins = cell.groupBy("bin").agg(F.sum("cnt").cast(_D38).alias("tot"))
    # <= 51 rows: the single-partition window is the intended plan.
    wprev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    c = bins.select(
        "bin",
        "tot",
        (
            2 * F.coalesce(F.sum("tot").over(wprev), F.lit(0)).cast(_D38)
            + F.col("tot")
            + 1
        ).alias("rank2"),
    )
    rg = (
        cell.join(F.broadcast(c), "bin")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast(_D38).alias("n_g"),
            F.sum(F.col("cnt").cast(_D38) * F.col("rank2")).alias("r2_g"),
        )
    )
    tie = c.agg(
        F.sum("tot").cast(_D38).alias("nn"),
        F.sum(
            F.col("tot") * F.col("tot") * F.col("tot") - F.col("tot")
        ).alias("tie3"),
    )
    s = rg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("r2_g").cast("double") * F.col("r2_g").cast("double")
            / (4.0 * F.col("n_g").cast("double"))
        ).alias("sr"),
    )
    nn_d = F.col("nn").cast("double")
    h = 12.0 / (nn_d * (nn_d + 1.0)) * F.col("sr") - 3.0 * (nn_d + 1.0)
    corr = 1.0 - F.col("tie3").cast("double") / (nn_d * nn_d * nn_d - nn_d)
    return s.crossJoin(F.broadcast(tie)).select(
        F.col("nn").cast("long").alias("n"),
        F.col("k"),
        (F.col("k") - 1).cast("long").alias("df"),
        r6(h).alias("h_stat"),
        r6(h / corr).alias("h_adj"),
    )


@register(
    "q_orders_cramers_v",
    oracle="""
        WITH cell AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        rm AS (SELECT seg, CAST(sum(n) AS BIGINT) AS r FROM cell GROUP BY 1),
        cm AS (SELECT prio, CAST(sum(n) AS BIGINT) AS c FROM cell GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                       CAST(count(DISTINCT seg) AS BIGINT) AS nr,
                       CAST(count(DISTINCT prio) AS BIGINT) AS nc
                FROM cell),
        x AS (
            SELECT sum((CAST(cell.n AS DOUBLE)
                        - CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE)
                          / CAST(tot.t AS DOUBLE))
                       * (CAST(cell.n AS DOUBLE)
                          - CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE)
                            / CAST(tot.t AS DOUBLE))
                       / (CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE)
                          / CAST(tot.t AS DOUBLE))) AS chi2
            FROM cell
            JOIN rm ON cell.seg = rm.seg
            JOIN cm ON cell.prio = cm.prio
            CROSS JOIN tot
        )
        SELECT t AS n,
               nr AS n_rows,
               nc AS n_cols,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
               round(chi2, 6) AS chi2,
               round(sqrt(chi2 / (CAST(t AS DOUBLE)
                                  * CAST(least(nr, nc) - 1 AS DOUBLE))),
                     6) AS cramers_v
        FROM x CROSS JOIN tot
    """,
    doc="Omnibus chi-square + Cramér's V for the market-segment × "
        "order-priority contingency — the single-number association gate "
        "(q_orders_chi2 is the per-cell residual drilldown on a "
        "join-free table; this one exercises the fact-fact "
        "orders ⋈ customer join first, so the contingency itself is the "
        "product of a real distributed join). Observed cells, exact "
        "integer marginals, expected = r·c/T; chi² and "
        "V = √(χ²/(N·(min(R,C)−1))) are doubles over the ≤5×5 grid, "
        "6-dp rounded on identical trees. Non-observed cells contribute "
        "0 to χ² exactly (obs=exp=rc/T only when a margin is 0, which "
        "cannot happen for an observed margin), so the cell-only join "
        "form equals the full-grid form. Scale shape: one shuffle join "
        "on custkey (AQE decides broadcast vs sort-merge), one "
        "map-side-combined aggregate onto ≤25 cells; margins and the "
        "statistic are constant-size folds reusing the cell table.",
)
def q_orders_cramers_v(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    cell = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rm = cell.groupBy("seg").agg(F.sum("n").alias("r"))
    cm = cell.groupBy("prio").agg(F.sum("n").alias("c"))
    tot = cell.agg(
        F.sum("n").alias("t"),
        F.countDistinct("seg").alias("nr"),
        F.countDistinct("prio").alias("nc"),
    )
    exp = (
        F.col("r").cast("double") * F.col("c").cast("double")
        / F.col("t").cast("double")
    )
    x = (
        cell.join(F.broadcast(rm), "seg")
        .join(F.broadcast(cm), "prio")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("n").cast("double") - exp)
                * (F.col("n").cast("double") - exp)
                / exp
            ).alias("chi2")
        )
    )
    return x.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("n"),
        F.col("nr").cast("long").alias("n_rows"),
        F.col("nc").cast("long").alias("n_cols"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("df"),
        r6(F.col("chi2")).alias("chi2"),
        r6(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("t").cast("double")
                    * (F.least("nr", "nc") - 1).cast("double")
                )
            )
        ).alias("cramers_v"),
    )


@register(
    "q_orders_two_proportion",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN 'bld' ELSE 'oth' END AS side,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(coalesce(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                                          THEN 1 END), 0) AS BIGINT) AS x
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ), w AS (
            SELECT max(CASE WHEN side = 'bld' THEN n END) AS n1,
                   max(CASE WHEN side = 'bld' THEN x END) AS x1,
                   max(CASE WHEN side = 'oth' THEN n END) AS n2,
                   max(CASE WHEN side = 'oth' THEN x END) AS x2
            FROM g
        )
        SELECT n1, x1, n2, x2,
               round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
               round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p2,
               round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     / sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                            * (1.0 - CAST(x1 + x2 AS DOUBLE)
                                     / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 / CAST(n1 AS DOUBLE)
                               + 1.0 / CAST(n2 AS DOUBLE))), 6) AS z_stat
        FROM w
    """,
    doc="Pooled two-proportion z-test: is the urgent-order share among "
        "BUILDING-segment customers different from everyone else — the "
        "simplest A/B gate a release pipeline runs, expressed with the "
        "house discipline anyway. Counts n_i and successes x_i are exact "
        "BIGINTs off one orders ⋈ customer join + 2-group aggregate; "
        "p̂_i, the pooled p̂ = (x1+x2)/(n1+n2) and "
        "z = (p̂1−p̂2)/√(p̂(1−p̂)(1/n1+1/n2)) are the final closed form, "
        "6-dp rounded on identical trees. Scale shape: one shuffle join "
        "on custkey, one map-side-combined 2-row aggregate, 1-row fold.",
)
def q_orders_two_proportion(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    g = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", F.lit("bld"))
            .otherwise(F.lit("oth"))
            .alias("side"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).alias("u"),
        )
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("u"), F.lit(0)).cast("long").alias("x"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("side") == "bld", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("side") == "bld", F.col("x"))).alias("x1"),
        F.max(F.when(F.col("side") == "oth", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("side") == "oth", F.col("x"))).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("x2").cast("double") / F.col("n2").cast("double")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    return w.select(
        "n1",
        "x1",
        "n2",
        "x2",
        r6(p1).alias("p1"),
        r6(p2).alias("p2"),
        r6(
            (p1 - p2)
            / F.sqrt(
                pp
                * (1.0 - pp)
                * (
                    1.0 / F.col("n1").cast("double")
                    + 1.0 / F.col("n2").cast("double")
                )
            )
        ).alias("z_stat"),
    )
