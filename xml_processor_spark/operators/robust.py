"""Rank-based / robust statistics over bounded aggregates (SURVEY §2.L).

The nonparametric drift-gate layer: when the Welch t-test's normality
assumption is off (heavy-tailed prices, outlier days), production monitors
reach for rank statistics — Mann–Whitney U, Spearman's ρ, Theil–Sen slopes,
the Wald–Wolfowitz runs test. All four follow the house scale rules
(`hypothesis.py` is the sibling module):

- **aggregate first**: the fact table collapses to a bounded histogram /
  grid / calendar series in ONE map-side-combined shuffle; every rank is a
  *midrank over that bounded structure*, never a per-row global sort (a
  single-partition window at 100 TB).
- **exact-integer internals**: midranks are kept ×2 (``2·cum_before +
  tot + 1``) so ties never produce a fractional intermediate; rank sums,
  tie terms (Σt³−t) and U statistics accumulate in decimal(38,0) —
  int64 overflows at ~3e9 rows/sample for U, far earlier for Σt³. Floats
  appear only in the final closed-form z / ρ / slope division, rounded to
  6 dp; both engines evaluate the identical expression tree over identical
  exact integers, so rounding absorbs libm residue (the Welch precedent).
- the decimal(38,0) ceiling binds at roughly N ≈ 2e12 rows for the rank
  sums (Σ n·r² ~ 4N³); the ~100 TB fact sizes assumed elsewhere in this
  repo (1.5e11 orders / 6e11 lineitems) sit ~100× under it.

Reference surface: none of these exist in the XMLParser envelope [P];
they are CORE extensions mandated by the BASELINE.json analytics scope,
same justification as `hypothesis.py`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import cents_sql
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_D38 = "decimal(38,0)"

# Shared with hypothesis.py by construction (kept literal so each module
# reads standalone): urgent vs normal orders, ~50-bin price histogram.
_GRP_SQL = "CASE WHEN o_orderpriority <= '2-HIGH' THEN 'hi' ELSE 'lo' END"
_BIN_W = 10_000
_BIN_MAX = 50


@register(
    "q_orders_mannwhitney",
    oracle=f"""
        WITH b AS (
            SELECT {_GRP_SQL} AS grp,
                   least(CAST(floor(o_totalprice / {_BIN_W}) AS BIGINT),
                         {_BIN_MAX}) AS bin
            FROM orders
        ), h AS (
            SELECT bin,
                   CAST(coalesce(sum(CASE WHEN grp = 'hi' THEN 1 END), 0)
                        AS BIGINT) AS cnt_hi,
                   CAST(coalesce(sum(CASE WHEN grp = 'lo' THEN 1 END), 0)
                        AS BIGINT) AS cnt_lo
            FROM b GROUP BY 1
        ), c AS (
            SELECT bin, cnt_hi, cnt_lo,
                   cnt_hi + cnt_lo AS tot,
                   CAST(coalesce(sum(cnt_hi + cnt_lo) OVER (
                       ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS DECIMAL(38,0)) AS cum_before
            FROM h
        ), s AS (
            SELECT
                CAST(sum(cnt_hi) AS DECIMAL(38,0)) AS n_hi,
                CAST(sum(cnt_lo) AS DECIMAL(38,0)) AS n_lo,
                sum(CAST(cnt_hi AS DECIMAL(38,0))
                    * (2 * cum_before + tot + 1)) AS r2_hi,
                sum(CAST(tot AS DECIMAL(38,0)) * tot * tot
                    - CAST(tot AS DECIMAL(38,0))) AS tie3
            FROM c
        )
        SELECT CAST(n_hi AS BIGINT) AS n_hi,
               CAST(n_lo AS BIGINT) AS n_lo,
               CAST(r2_hi - n_hi * (n_hi + 1) AS DOUBLE) / 2.0 AS u_hi,
               round(
                   (CAST(r2_hi - n_hi * (n_hi + 1) AS DOUBLE)
                    - CAST(n_hi * n_lo AS DOUBLE))
                   / (2.0 * sqrt(
                       CAST(n_hi AS DOUBLE) * CAST(n_lo AS DOUBLE) / 12.0
                       * ((CAST(n_hi + n_lo AS DOUBLE) + 1.0)
                          - CAST(tie3 AS DOUBLE)
                            / (CAST(n_hi + n_lo AS DOUBLE)
                               * (CAST(n_hi + n_lo AS DOUBLE) - 1.0))))),
                   6) AS z_u
        FROM s
    """,
    doc=f"Mann–Whitney U rank-sum test between the urgent (priority ≤ "
        "2-HIGH) and normal order-price populations — the nonparametric "
        "twin of q_orders_welch_ttest for heavy-tailed prices. Values "
        f"quantize to the same ≤{_BIN_MAX + 1}-bucket price histogram as "
        "q_orders_ks_binned (bin width = declared rank resolution; every "
        "bin is one big tie handled by midranks). Midranks are exact "
        "integers kept ×2 (2·cum_before + tot + 1); the rank sum R, "
        "U = R − n_hi(n_hi+1)/2, and the tie term Σ(t³−t) accumulate in "
        "decimal(38,0) — t³ alone is 3e33 at 1.5e11 rows/sample, 2^63 is "
        "hopeless. z uses the tie-corrected variance "
        "n_hi·n_lo/12·((N+1) − Σ(t³−t)/(N(N−1))); floats enter only in "
        "this final closed form, 6-dp rounded, identical expression tree "
        "in both engines. Scale shape: ONE map-side-combined histogram "
        "aggregate over the fact scan; cumulative window + test math over "
        f"≤{_BIN_MAX + 1} rows.",
)
def q_orders_mannwhitney(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    grp = F.when(
        F.col("o_orderpriority") <= "2-HIGH", F.lit("hi")
    ).otherwise(F.lit("lo"))
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / _BIN_W).cast("long"),
        F.lit(_BIN_MAX).cast("long"),
    )
    h = (
        o.select(grp.alias("grp"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("grp") == "hi", 1)), F.lit(0)
            ).cast("long").alias("cnt_hi"),
            F.coalesce(
                F.sum(F.when(F.col("grp") == "lo", 1)), F.lit(0)
            ).cast("long").alias("cnt_lo"),
        )
    )
    # ≤ 51 rows from here on: the single-partition window is the intended
    # plan over the bounded histogram, not a scale hazard.
    wprev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    c = h.select(
        "bin",
        "cnt_hi",
        "cnt_lo",
        (F.col("cnt_hi") + F.col("cnt_lo")).alias("tot"),
        F.coalesce(
            F.sum(F.col("cnt_hi") + F.col("cnt_lo")).over(wprev), F.lit(0)
        ).cast(_D38).alias("cum_before"),
    )
    s = c.agg(
        F.sum("cnt_hi").cast(_D38).alias("n_hi"),
        F.sum("cnt_lo").cast(_D38).alias("n_lo"),
        F.sum(
            F.col("cnt_hi").cast(_D38)
            * (2 * F.col("cum_before") + F.col("tot") + 1)
        ).alias("r2_hi"),
        F.sum(
            F.col("tot").cast(_D38) * F.col("tot") * F.col("tot")
            - F.col("tot").cast(_D38)
        ).alias("tie3"),
    )
    u2 = (F.col("r2_hi") - F.col("n_hi") * (F.col("n_hi") + 1)).cast("double")
    nh = F.col("n_hi").cast("double")
    nl = F.col("n_lo").cast("double")
    n = (F.col("n_hi") + F.col("n_lo")).cast("double")
    var_u = (
        nh * nl / 12.0
        * ((n + 1.0) - F.col("tie3").cast("double") / (n * (n - 1.0)))
    )
    return s.select(
        F.col("n_hi").cast("long").alias("n_hi"),
        F.col("n_lo").cast("long").alias("n_lo"),
        (u2 / 2.0).alias("u_hi"),
        F.round(
            (u2 - (F.col("n_hi") * F.col("n_lo")).cast("double"))
            / (2.0 * F.sqrt(var_u)),
            6,
        ).alias("z_u"),
    )


@register(
    "q_lineitem_spearman",
    oracle=f"""
        WITH g AS (
            SELECT CAST(round(l_quantity) AS BIGINT) AS x,
                   {cents_sql('l_discount')} AS y,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2
        ), mx AS (
            SELECT x,
                   2 * CAST(coalesce(sum(nx) OVER (
                       ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS DECIMAL(38,0)) + nx + 1 AS rx2
            FROM (SELECT x, sum(n) AS nx FROM g GROUP BY 1)
        ), my AS (
            SELECT y,
                   2 * CAST(coalesce(sum(ny) OVER (
                       ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS DECIMAL(38,0)) + ny + 1 AS ry2
            FROM (SELECT y, sum(n) AS ny FROM g GROUP BY 1)
        ), s AS (
            SELECT CAST(sum(g.n) AS DECIMAL(38,0)) AS nn,
                   sum(g.n * rx2) AS sx,
                   sum(g.n * ry2) AS sy,
                   sum(g.n * rx2 * rx2) AS sxx,
                   sum(g.n * ry2 * ry2) AS syy,
                   sum(g.n * rx2 * ry2) AS sxy
            FROM g JOIN mx USING (x) JOIN my USING (y)
        )
        SELECT CAST(nn AS BIGINT) AS n_rows,
               round(
                   (CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt(
                       (CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                   6) AS spearman_rho
        FROM s
    """,
    doc="Spearman rank correlation between line quantity and discount — "
        "the monotone-association drift check that Pearson (q_agg_stats / "
        "q_agg_corr_matrix) gets wrong under outliers. Both variables are "
        "naturally discrete (quantity 1..50, discount 0..10 cents), so the "
        "joint distribution collapses EXACTLY to a ≤50×11 grid in one "
        "map-side-combined shuffle — no binning loss, no global rank sort. "
        "Midranks come from the two marginal cumulative windows (each over "
        "≤50 rows), kept ×2 in decimal(38,0) so ties stay integer-exact; "
        "the ×2 factors cancel in ρ. The six grid moments (N, Σnr_x, "
        "Σnr_y, Σnr_x², Σnr_y², Σnr_xr_y) are exact decimals (Σnr² ~ 4N³ "
        "≈ 9e35 at 6e11 lineitems — int64 overflows past ~2e6 rows); the "
        "closed-form ρ combines them in double (N·Sxx ~ 5e47 exceeds any "
        "fixed decimal), 6-dp rounded, identical tree both engines. Scale "
        "shape: one grid aggregate over the fact scan; two ≤50-row "
        "broadcast-joined marginal tables; one 550-row final fold.",
)
def q_lineitem_spearman(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.round(F.col("l_quantity")).cast("long").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        # The ≤50×11 grid feeds three branches (both marginals + the final
        # moment fold): checkpoint so the fact scan runs once.
        .localCheckpoint(eager=True)
    )
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    mx = (
        g.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .select(
            "x",
            (
                2 * F.coalesce(F.sum("nx").over(wx), F.lit(0)).cast(_D38)
                + F.col("nx")
                + 1
            ).alias("rx2"),
        )
    )
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    my = (
        g.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .select(
            "y",
            (
                2 * F.coalesce(F.sum("ny").over(wy), F.lit(0)).cast(_D38)
                + F.col("ny")
                + 1
            ).alias("ry2"),
        )
    )
    s = (
        g.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .agg(
            F.sum("n").cast(_D38).alias("nn"),
            F.sum(F.col("n") * F.col("rx2")).alias("sx"),
            F.sum(F.col("n") * F.col("ry2")).alias("sy"),
            F.sum(F.col("n") * F.col("rx2") * F.col("rx2")).alias("sxx"),
            F.sum(F.col("n") * F.col("ry2") * F.col("ry2")).alias("syy"),
            F.sum(F.col("n") * F.col("rx2") * F.col("ry2")).alias("sxy"),
        )
    )
    nn = F.col("nn").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return s.select(
        F.col("nn").cast("long").alias("n_rows"),
        F.round(
            (nn * F.col("sxy").cast("double") - sx * sy)
            / F.sqrt(
                (nn * F.col("sxx").cast("double") - sx * sx)
                * (nn * F.col("syy").cast("double") - sy * sy)
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "q_nation_theilsen",
    oracle=f"""
        WITH yr AS (
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS yr,
                   CAST(sum({cents_sql('o.o_totalprice')}) AS BIGINT) AS rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ), pairs AS (
            SELECT a.n_name,
                   (b.rev - a.rev) * 60 // (b.yr - a.yr) AS slope60
            FROM yr a JOIN yr b
              ON a.n_name = b.n_name AND b.yr > a.yr
        ), ranked AS (
            SELECT n_name, slope60,
                   row_number() OVER (PARTITION BY n_name
                                      ORDER BY slope60) AS rn,
                   count(*) OVER (PARTITION BY n_name) AS m
            FROM pairs
        )
        SELECT n_name,
               CAST(max(m) AS BIGINT) AS n_pairs,
               round(CAST(avg(CAST(slope60 AS DOUBLE)) AS DOUBLE)
                     / 6000.0, 6) AS ts_slope
        FROM ranked
        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        GROUP BY 1
    """,
    doc="Theil–Sen robust trend slope of yearly revenue per nation — the "
        "median of all pairwise year-over-year slopes, immune to the "
        "single blow-out year that drags the OLS line (q_trend_ols is the "
        "parametric twin). Aggregate-first: the fact tables collapse to a "
        "≤|nations|×|years| calendar of integer-cent revenues (one "
        "map-side-combined shuffle after two dimension joins); the "
        "pairwise stage is a self-join of that BOUNDED table (≤21 pairs "
        "per nation at 7 years — never a fact-level all-pairs). Slopes "
        "are exact integers in cents×60/year (60 = lcm of year gaps 1..6, "
        "so the division never truncates); the median over ≤21 slopes is "
        "taken positionally via row_number — both middle elements "
        "averaged on even counts, exactly as DuckDB's quantile would, but "
        "spelled out so both engines run the identical total order. Scale "
        "shape: everything after the first aggregate is calendar-bounded; "
        "the self-join side is broadcast-sized at ANY SF.",
)
def q_nation_theilsen(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    yr = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("rev")
        )
        # ≤ |nations|×|years| rows feed BOTH self-join sides: checkpoint so
        # the 3-table fact join runs once, not twice (pagerank precedent).
        .localCheckpoint(eager=True)
    )
    a = yr.alias("a")
    b = yr.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.n_name") == F.col("b.n_name"))
        & (F.col("b.yr") > F.col("a.yr")),
    ).selectExpr(
        "a.n_name AS n_name",
        # Exact integer slope: every year gap 1..6 divides 60, so DIV never
        # truncates (trunc == floor on exact quotients — the Spark DIV /
        # DuckDB // semantics difference is moot). Staying in BIGINT
        # matters: long/long would promote to double, which is inexact
        # past 2^53 (rev diffs ×60 reach ~2e18 at 100 TB).
        "((b.rev - a.rev) * 60L) DIV (b.yr - a.yr) AS slope60",
    )
    w = Window.partitionBy("n_name").orderBy("slope60")
    ranked = pairs.select(
        "n_name",
        "slope60",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("n_name").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(m + 1) DIV 2"))
        | (F.col("rn") == F.expr("(m + 2) DIV 2"))
    )
    return mid.groupBy("n_name").agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round(F.avg(F.col("slope60").cast("double")) / 6000.0, 6)
        .alias("ts_slope"),
    )


@register(
    "q_orders_runs_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY 1
        ), diffs AS (
            SELECT d, cnt - lag(cnt) OVER (ORDER BY d) AS diff
            FROM daily
        ), signs AS (
            SELECT d, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
            FROM diffs WHERE diff IS NOT NULL AND diff <> 0
        ), runs AS (
            SELECT s,
                   CASE WHEN s <> lag(s) OVER (ORDER BY d)
                        THEN 1 ELSE 0 END AS boundary
            FROM signs
        ), agg AS (
            SELECT CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos,
                   CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_neg,
                   CAST(1 + sum(boundary) AS BIGINT) AS runs
            FROM runs
        )
        SELECT n_pos, n_neg, runs,
               round(
                   (CAST(runs AS DOUBLE)
                    - (2.0 * n_pos * n_neg
                       / CAST(n_pos + n_neg AS DOUBLE) + 1.0))
                   / sqrt(
                       2.0 * n_pos * n_neg
                       * (2.0 * n_pos * n_neg
                          - CAST(n_pos + n_neg AS DOUBLE))
                       / (CAST(n_pos + n_neg AS DOUBLE)
                          * CAST(n_pos + n_neg AS DOUBLE)
                          * (CAST(n_pos + n_neg AS DOUBLE) - 1.0))),
                   6) AS z_runs
        FROM agg
    """,
    doc="Wald–Wolfowitz runs test on the sign of day-over-day change in "
        "daily order volume — detects autocorrelated regimes (streaks of "
        "growth/decline) that a mean-level test never sees; the "
        "sequential-randomness gate of a drift monitor. Aggregate-first: "
        "the fact scan collapses to one map-side-combined |days| "
        "histogram (calendar-bounded ~2.4k rows at ANY SF — 100 TB adds "
        "orders per day, not days); the lag/boundary windows run over "
        "that bounded series (single-partition by design, same class as "
        "q_orders_backlog). Zero diffs are dropped per the classical "
        "procedure; run count R = 1 + Σ sign-boundaries, n± are exact "
        "integers; z = (R − μ)/σ with μ = 2ab/N + 1, "
        "σ² = 2ab(2ab−N)/(N²(N−1)) evaluated in double over the exact "
        "counts, 6-dp rounded, identical expression tree both engines.",
)
def q_orders_runs_test(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Bounded calendar series from here on (~2.4k rows at any SF): the
    # single-partition lag windows are the intended plan.
    wd = Window.orderBy("d")
    diffs = daily.select(
        "d", (F.col("cnt") - F.lag("cnt").over(wd)).alias("diff")
    )
    signs = diffs.filter(
        F.col("diff").isNotNull() & (F.col("diff") != 0)
    ).select("d", F.when(F.col("diff") > 0, 1).otherwise(-1).alias("s"))
    runs = signs.select(
        "s",
        F.when(F.col("s") != F.lag("s").over(wd), 1).otherwise(0)
        .alias("boundary"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("long")
        .alias("n_neg"),
        (1 + F.sum("boundary")).cast("long").alias("runs"),
    )
    a = F.col("n_pos").cast("double")
    b = F.col("n_neg").cast("double")
    nd = (F.col("n_pos") + F.col("n_neg")).cast("double")
    mu = 2.0 * a * b / nd + 1.0
    var = 2.0 * a * b * (2.0 * a * b - nd) / (nd * nd * (nd - 1.0))
    return agg.select(
        "n_pos",
        "n_neg",
        "runs",
        F.round(
            (F.col("runs").cast("double") - mu) / F.sqrt(var), 6
        ).alias("z_runs"),
    )


@register(
    "q_orders_mann_kendall",
    oracle="""
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY 1
        ), s_pairs AS (
            SELECT CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                                 WHEN b.cnt < a.cnt THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM monthly a JOIN monthly b ON b.mon > a.mon
        ), ties AS (
            SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                        AS BIGINT) AS tie18
            FROM (SELECT count(*) AS t FROM monthly GROUP BY cnt)
            WHERE t > 1
        ), nn AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM monthly
        )
        SELECT n, s_stat,
               round(
                   (CAST(s_stat AS DOUBLE)
                    - CASE WHEN s_stat > 0 THEN 1.0
                           WHEN s_stat < 0 THEN -1.0 ELSE 0.0 END)
                   / sqrt((CAST(n AS DOUBLE) * (n - 1.0) * (2.0 * n + 5.0)
                           - CAST(tie18 AS DOUBLE)) / 18.0),
                   6) AS z_mk
        FROM nn, s_pairs, ties
    """,
    doc="Mann–Kendall trend test on the monthly order-volume series — the "
        "nonparametric companion of q_nation_theilsen (Sen's slope "
        "estimates the trend MK detects; together they are the standard "
        "Mann-Kendall/Sen monitoring pair). Aggregate-first: the fact "
        "scan collapses to a calendar-bounded ~84-month histogram in one "
        "map-side-combined shuffle; S = Σ_{i<j} sign(y_j − y_i) comes "
        "from a self-join of that BOUNDED series (≤3.5k pairs at any SF "
        "— more data changes the counts, not the month count). S, the "
        "tie term Σt(t−1)(2t+5), and n are exact integers; z applies the "
        "classical continuity correction (S∓1) over the tie-corrected "
        "variance (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18 in double, 6-dp "
        "rounded, identical expression tree both engines.",
)
def q_orders_mann_kendall(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date")
            .alias("mon")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        # The ~84-row series feeds four branches (both pair-join sides,
        # ties, n); localCheckpoint truncates lineage so the fact scan
        # runs ONCE, not once per branch (the pagerank precedent —
        # cluster deployments would checkpoint to HDFS instead).
        .localCheckpoint(eager=True)
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    # The self-join input is the calendar-bounded monthly table (~84 rows
    # at any SF): broadcast it so the non-equi pair join is a bounded BNLJ,
    # never a cartesian shuffle.
    s_pairs = a.join(F.broadcast(b), F.col("b.mon") > F.col("a.mon")).agg(
        F.sum(
            F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
            .when(F.col("b.cnt") < F.col("a.cnt"), -1)
            .otherwise(0)
        ).cast("long").alias("s_stat")
    )
    ties = (
        monthly.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("long").alias("tie18")
        )
    )
    nn = monthly.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = nn.crossJoin(F.broadcast(s_pairs)).crossJoin(F.broadcast(ties))
    s = F.col("s_stat").cast("double")
    n = F.col("n").cast("double")
    cc = (
        F.when(F.col("s_stat") > 0, F.lit(1.0))
        .when(F.col("s_stat") < 0, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    var18 = (
        n * (n - 1.0) * (2.0 * n + 5.0) - F.col("tie18").cast("double")
    ) / 18.0
    return j.select(
        "n",
        "s_stat",
        F.round((s - cc) / F.sqrt(var18), 6).alias("z_mk"),
    )


@register(
    "q_cust_mahalanobis",
    oracle=f"""
        WITH feat AS (
            SELECT c.c_mktsegment AS seg,
                   {cents_sql('c.c_acctbal')} AS x,
                   CAST(coalesce(o.n_orders, 0) AS BIGINT) AS y
            FROM customer c
            LEFT JOIN (
                SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY 1
            ) o ON c.c_custkey = o.o_custkey
        ), m AS (
            SELECT seg,
                   CAST(count(*) AS DECIMAL(38,0)) AS n,
                   CAST(sum(x) AS DECIMAL(38,0)) AS sx,
                   CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                   sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                   sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
            FROM feat GROUP BY 1
        ), cov AS (
            SELECT seg, CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                   (CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                       AS vx,
                   (CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                       AS vy,
                   (CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                       AS cxy
            FROM m
        ), d AS (
            SELECT f.seg,
                   (cov.vy * (f.x - cov.mx) * (f.x - cov.mx)
                    - 2.0 * cov.cxy * (f.x - cov.mx) * (f.y - cov.my)
                    + cov.vx * (f.y - cov.my) * (f.y - cov.my))
                   / (cov.vx * cov.vy - cov.cxy * cov.cxy) AS d2
            FROM feat f JOIN cov ON f.seg = cov.seg
        )
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(CASE WHEN d2 > 9.0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers,
               round(max(d2), 6) AS max_d2
        FROM d GROUP BY 1
    """,
    doc="Per-segment bivariate Mahalanobis outlier audit over (account "
        "balance, order count) — the multivariate upgrade of q_cust_iqr: "
        "a customer can be unremarkable on each margin yet impossible "
        "jointly (huge balance, zero orders). Per segment the five "
        "second-order moments accumulate as exact integers (cents / "
        "counts in decimal(38,0) — Σx² reaches ~1e25 at 1.5e10 "
        "customers); the 2×2 covariance inverse is closed-form, and "
        "d² = (v_y·dx² − 2c·dx·dy + v_x·dy²)/det is evaluated per row in "
        "double from those exact moments — identical expression tree "
        "both engines, so the d² > 9 (3σ-equivalent) cut and max(d²) "
        "agree bit-for-bit. Scale shape: one per-customer order-count "
        "aggregate (map-side combined), one equi join customer⋈counts, "
        "one 5-row moment aggregate broadcast back over the customer "
        "scan — no sort, no all-pairs, two fact shuffles total.",
)
def q_cust_mahalanobis(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    feat = (
        c.join(counts, c.c_custkey == counts.o_custkey, "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("y"),
        )
    )
    m = feat.groupBy("seg").agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum("x").cast(_D38).alias("sx"),
        F.sum("y").cast(_D38).alias("sy"),
        F.sum(F.col("x").cast(_D38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(_D38) * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov = m.select(
        "seg",
        (F.col("sx").cast("double") / nd).alias("mx"),
        (F.col("sy").cast("double") / nd).alias("my"),
        (
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
            )
            / (nd - 1.0)
        ).alias("vx"),
        (
            (
                F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double") / nd
            )
            / (nd - 1.0)
        ).alias("vy"),
        (
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double") / nd
            )
            / (nd - 1.0)
        ).alias("cxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d = feat.join(F.broadcast(cov), "seg").select(
        "seg",
        (
            (
                F.col("vy") * dx * dx
                - 2.0 * F.col("cxy") * dx * dy
                + F.col("vx") * dy * dy
            )
            / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"))
        ).alias("d2"),
    )
    return d.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum(F.when(F.col("d2") > 9.0, 1).otherwise(0)).cast("long")
        .alias("n_outliers"),
        F.round(F.max("d2"), 6).alias("max_d2"),
    )


# Poisson(1) inverse-CDF cutoffs on a 1e6 lattice: P(0)=P(1)=e^-1,
# P(2)=e^-1/2, P(3)=e^-1/6, tail mass (~1.9%) truncated to w=4. The lattice
# approximation (±5e-7 per class) and the truncation are part of the
# operator's declared semantics — both engines draw from the identical
# deterministic lattice, so the resample weights match bit-for-bit.
_BOOT_B = 32
_BOOT_C0, _BOOT_C1, _BOOT_C2, _BOOT_C3 = 367879, 735759, 919699, 981012
_BOOT_W_SQL = f"""CASE WHEN u < {_BOOT_C0} THEN 0
                       WHEN u < {_BOOT_C1} THEN 1
                       WHEN u < {_BOOT_C2} THEN 2
                       WHEN u < {_BOOT_C3} THEN 3
                       ELSE 4 END"""


@register(
    "q_lineitem_bootstrap",
    oracle=f"""
        WITH hashes AS (
            SELECT j,
                   md5(CAST(l_orderkey AS VARCHAR) || '-'
                       || CAST(l_linenumber AS VARCHAR) || ':'
                       || CAST(j AS VARCHAR)) AS h,
                   {cents_sql('l_extendedprice')} AS c
            FROM lineitem,
                 (SELECT unnest(generate_series(0, 10)) AS j)
        ), draws AS (
            SELECT 3 * j + k AS b,
                   CAST(concat('0x', substring(h, 5 * k + 1, 5)) AS BIGINT)
                       % 1000000 AS u,
                   c
            FROM hashes, (SELECT unnest(generate_series(0, 2)) AS k)
            WHERE 3 * j + k < {_BOOT_B}
        ), w AS (
            SELECT b, {_BOOT_W_SQL} AS w, c FROM draws
        ), means AS (
            SELECT b,
                   CAST(sum(CAST(w AS DECIMAL(38,0)) * c) AS DOUBLE)
                   / CAST(CAST(sum(w) AS DECIMAL(38,0)) AS DOUBLE) / 100.0
                       AS mean_b,
                   CAST(count(*) AS BIGINT) AS n_rows_b,
                   CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                       AS sum_c_b
            FROM w GROUP BY b
        ), ranked AS (
            SELECT mean_b,
                   row_number() OVER (ORDER BY mean_b, b) AS rn
            FROM means
        ), base AS (
            SELECT n_rows_b AS n_rows,
                   round(CAST(sum_c_b AS DOUBLE) / n_rows_b / 100.0, 6)
                       AS mean_price
            FROM means WHERE b = 0
        )
        SELECT base.n_rows, base.mean_price,
               round(max(CASE WHEN rn = 2 THEN mean_b END), 6) AS boot_lo,
               round(max(CASE WHEN rn = {_BOOT_B - 1} THEN mean_b END), 6)
                   AS boot_hi
        FROM ranked, base
        GROUP BY base.n_rows, base.mean_price
    """,
    doc=f"Poisson-bootstrap confidence interval for the mean extended "
        f"price — the distributed bootstrap (Chamandy et al., 'Estimating "
        f"uncertainty for massive data streams'): classical resampling "
        f"needs n draws WITH replacement from a global sample (impossible "
        f"to shard), the Poisson bootstrap gives each row an independent "
        f"Poisson(1) resample weight, computable scan-side from a content "
        f"hash with NO coordination. {_BOOT_B} resamples, weights drawn "
        f"on a 1e6 lattice from 20-bit slices of md5(orderkey-"
        f"linenumber:j) — each 15-hex digest yields THREE lattice draws, "
        f"so {_BOOT_B} resamples cost 11 md5s/row, not {_BOOT_B} (tail "
        f"truncated at w=4, ~1.9% mass — declared semantics, identical "
        f"in both engines). Per-resample means are exact-integer ratios "
        f"(Σw·cents in decimal(38,0) — 4·1e7·6e11 rows overflows int64); "
        f"the reported CI is positional (2nd / {_BOOT_B - 1}th of the "
        f"{_BOOT_B} sorted means ≈ 93.5% coverage) — order statistics, "
        f"not float quantile interpolation, so engines agree exactly. "
        f"Scale shape: the ×{_BOOT_B} row Generate collapses map-side "
        f"into a {_BOOT_B}-group partial aggregate before any shuffle — "
        f"one fact scan, 11 md5s/row of CPU, a {_BOOT_B}-row "
        f"reduce; the window runs over {_BOOT_B} rows. The bootstrap's "
        f"cost is CPU-linear, never a second pass over storage.",
)
def q_lineitem_bootstrap(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    hashes = li.select(
        c.alias("c"),
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
    ).select(
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(10))).alias("j"),
        F.col("key"),
    ).select(
        "c",
        "j",
        F.md5(F.concat_ws(":", F.col("key"), F.col("j").cast("string")))
        .alias("h"),
    )
    drawn = (
        hashes.select(
            "c",
            "j",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"),
        )
        .filter(3 * F.col("j") + F.col("k") < _BOOT_B)
        .select(
            (3 * F.col("j") + F.col("k")).alias("b"),
            "c",
            (
                F.expr("CAST(conv(substring(h, 5 * k + 1, 5), 16, 10) AS BIGINT)")
                % 1000000
            ).alias("u"),
        )
    )
    w = drawn.select("b", "c", F.expr(_BOOT_W_SQL).alias("w"))
    means = w.groupBy("b").agg(
        (
            F.sum(F.col("w").cast(_D38) * F.col("c")).cast("double")
            / F.sum("w").cast(_D38).cast("double")
            / 100.0
        ).alias("mean_b"),
        F.count(F.lit(1)).cast("long").alias("n_rows_b"),
        F.sum(F.col("c").cast(_D38)).cast(_D38).alias("sum_c_b"),
    ).localCheckpoint(eager=True)  # 32 rows feed two branches: one scan
    ranked = means.select(
        "mean_b",
        F.row_number().over(Window.orderBy("mean_b", "b")).alias("rn"),
    )
    # Every row appears exactly once in each resample group, so group b=0
    # carries the UNWEIGHTED totals for free — the point estimate costs no
    # second fact pass.
    base = means.filter(F.col("b") == 0).select(
        F.col("n_rows_b").alias("n_rows"),
        F.round(
            F.col("sum_c_b").cast("double") / F.col("n_rows_b") / 100.0, 6
        ).alias("mean_price"),
    )
    ci = ranked.agg(
        F.round(
            F.max(F.when(F.col("rn") == 2, F.col("mean_b"))), 6
        ).alias("boot_lo"),
        F.round(
            F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_b"))), 6
        ).alias("boot_hi"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_rows", "mean_price", "boot_lo", "boot_hi"
    )
