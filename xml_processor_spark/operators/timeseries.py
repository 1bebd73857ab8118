"""Time-series diagnostics over the events/orders feeds (SURVEY §2.L).

Trend, autocorrelation, inter-arrival, and concentration statistics — the
drift-monitoring layer of a data-pipeline dashboard. Design rules shared by
every operator here:

- **aggregate first**: the fact table collapses to a (key, day) or
  (key, entity) aggregate in ONE map-side-combined shuffle; every closed-form
  statistic runs over that bounded aggregate, never the raw feed.
- **exact-integer moments**: Σx, Σy, Σxy, Σx², Σy² are sums of BIGINT
  products accumulated in decimal(38,0) (Spark) / HUGEINT (DuckDB), so the
  reduction is order-independent and bit-identical across engines and
  partitionings; floats appear only in the final division, rounded to 6 dp.
- **no global windows over unbounded rows**: cumulative shares run over
  fixed histogram buckets; ranks are per-partition or avoided entirely.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_D38 = "decimal(38,0)"

# Shared daily-count aggregate: x = day index since the corpus min day
# (exact integer), y = event count that day. Both engines derive x with
# integer date arithmetic, so every OLS/autocorr moment below is exact.
_DAILY_SQL = """
        daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        spine AS (SELECT min(d) AS d0 FROM daily),
        xy AS (
            SELECT event_type,
                   CAST(date_diff('day', spine.d0, daily.d) AS BIGINT) AS x,
                   y
            FROM daily, spine
        )
"""


def _daily_xy(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
        # The daily aggregate is |types×days| — bounded at any corpus
        # size. Pin it (the q_dedup_cluster discipline) so the min-day
        # spine and every self-join alias reuse ONE fact scan instead of
        # Catalyst re-deriving the aggregate per alias (observed: 4×
        # parquet scans in the autocorr plan without this).
        .localCheckpoint()
    )
    spine = daily.agg(F.min("d").alias("d0"))
    return daily.crossJoin(F.broadcast(spine)).select(
        "event_type",
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("x"),
        "y",
    )


@register(
    "q_trend_ols",
    oracle=f"""
        WITH {_DAILY_SQL},
        m AS (
            SELECT event_type,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(x) AS HUGEINT) AS sx,
                   CAST(sum(y) AS HUGEINT) AS sy,
                   CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                   CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                   CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
            FROM xy GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               round(CAST(n*sxy - sx*sy AS DOUBLE)
                     / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - CAST(n*sxy - sx*sy AS DOUBLE)
                        / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0)
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                   AS intercept,
               round(CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE)
                     / nullif(CAST((n*sxx - sx*sx) * (n*syy - sy*sy)
                                   AS DOUBLE), 0), 6) AS r2
        FROM m
    """,
    origin="CORE",
    doc="Per-event-type OLS trend of the daily volume series: slope "
        "(events/day drift), intercept, and r² from the closed-form "
        "normal equations. x = integer day index since the corpus min "
        "day, y = daily count; all five moments (Σx, Σy, Σxy, Σx², Σy²) "
        "are exact integer sums in decimal(38,0)/HUGEINT — no float "
        "enters until the final division (nΣxy−ΣxΣy can reach ~4e18 at "
        "100 TB daily volumes, past int64 but nowhere near 1e38). Scale "
        "shape: ONE map-side-combined fact shuffle onto |types×days| "
        "cells, a 1-row min-day broadcast, then constant-size math; "
        "degenerate series (1 day, constant y) yield NULL via nullif in "
        "both dialects.",
)
def q_trend_ols(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    d = lambda c: F.col(c).cast(_D38)  # noqa: E731
    m = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum("x").cast(_D38).alias("sx"),
        F.sum("y").cast(_D38).alias("sy"),
        F.sum(F.col("x").cast(_D38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(_D38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).alias("syy"),
    )
    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    den = F.nullif(
        (d("n") * d("sxx") - d("sx") * d("sx")).cast("double"), F.lit(0.0)
    )
    den_y = F.nullif(
        (d("n") * d("syy") - d("sy") * d("sy")).cast("double"), F.lit(0.0)
    )
    slope = num / den
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        r6(slope).alias("slope"),
        r6(
            (d("sy").cast("double") - slope * d("sx").cast("double"))
            / d("n").cast("double")
        ).alias("intercept"),
        r6(num * num / (den * den_y)).alias("r2"),
    )


@register(
    "q_events_autocorr",
    oracle=f"""
        WITH {_DAILY_SQL},
        pairs AS (
            SELECT a.event_type, a.y AS yt, b.y AS yp
            FROM xy a JOIN xy b
                 ON a.event_type = b.event_type AND a.x = b.x + 1
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(yt) AS HUGEINT) AS st,
                   CAST(sum(yp) AS HUGEINT) AS sp,
                   CAST(sum(CAST(yt AS HUGEINT) * yp) AS HUGEINT) AS stp,
                   CAST(sum(CAST(yt AS HUGEINT) * yt) AS HUGEINT) AS stt,
                   CAST(sum(CAST(yp AS HUGEINT) * yp) AS HUGEINT) AS spp
            FROM pairs GROUP BY 1
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_pairs,
               round(CAST(n*stp - st*sp AS DOUBLE)
                     / nullif(sqrt(CAST(n*stt - st*st AS DOUBLE)
                                   * CAST(n*spp - sp*sp AS DOUBLE)), 0), 6)
                   AS autocorr_lag1
        FROM m
    """,
    origin="CORE",
    doc="Lag-1 autocorrelation of each event type's daily-count series — "
        "the burstiness/periodicity monitor. Consecutive-CALENDAR-day "
        "pairs come from an equi self-join of the daily aggregate on "
        "(type, x = x+1) — well-defined under day gaps, unlike lag() "
        "over observed rows — then Pearson r in closed form from exact "
        "integer moments (decimal(38,0)/HUGEINT; float only at the final "
        "sqrt+division, rounded 6 dp). Scale shape: one fact shuffle to "
        "|types×days| cells; the self-join and moments run on that "
        "bounded aggregate; constant series yield NULL via nullif in "
        "both dialects.",
)
def q_events_autocorr(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    a, b = xy.alias("a"), xy.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") == F.col("b.x") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.y").alias("yt"),
        F.col("b.y").alias("yp"),
    )
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum("yt").cast(_D38).alias("st"),
        F.sum("yp").cast(_D38).alias("sp"),
        F.sum(F.col("yt").cast(_D38) * F.col("yp")).alias("stp"),
        F.sum(F.col("yt").cast(_D38) * F.col("yt")).alias("stt"),
        F.sum(F.col("yp").cast(_D38) * F.col("yp")).alias("spp"),
    )
    d = lambda c: F.col(c)  # noqa: E731
    num = (d("n") * d("stp") - d("st") * d("sp")).cast("double")
    den = F.nullif(
        F.sqrt(
            (d("n") * d("stt") - d("st") * d("st")).cast("double")
            * (d("n") * d("spp") - d("sp") * d("sp")).cast("double")
        ),
        F.lit(0.0),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        r6(num / den).alias("autocorr_lag1"),
    )


# Inter-arrival histogram: weekly buckets, clamped at bucket 12 ("84+ days")
# so the output is a FIXED ≤13 rows at any scale (the q_agg_histogram
# edge-clamp discipline).
_GAP_CAP = 12


@register(
    "q_orders_interarrival",
    oracle=f"""
        WITH gaps AS (
            SELECT date_diff('day',
                             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey),
                             o_orderdate) AS gap
            FROM orders
        ),
        hist AS (
            SELECT least(gap // 7, {_GAP_CAP}) AS week_bucket,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(min(gap) AS BIGINT) AS min_gap,
                   CAST(max(gap) AS BIGINT) AS max_gap
            FROM gaps WHERE gap IS NOT NULL
            GROUP BY 1
        )
        SELECT week_bucket, n_gaps, min_gap, max_gap,
               round(CAST(sum(n_gaps) OVER (ORDER BY week_bucket) AS DOUBLE)
                     / CAST(sum(n_gaps) OVER () AS DOUBLE), 6) AS cum_share
        FROM hist
    """,
    origin="CORE",
    doc="Customer inter-order gap histogram — the repurchase-cadence "
        "distribution behind replenishment forecasts. Per-customer "
        "consecutive-order gaps in whole days via lag() over a "
        "PER-CUSTOMER window (partitioned: one key-hash shuffle, no "
        "global sort; o_orderkey tie-breaks same-day orders), then a "
        "weekly histogram edge-clamped at bucket {cap} ('84+ days') so "
        "the output is ≤13 rows at any corpus size; the cumulative-share "
        "windows run over that fixed aggregate.".format(cap=_GAP_CAP),
)
def q_orders_interarrival(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap")
    ).filter(F.col("gap").isNotNull())
    hist = gaps.groupBy(
        F.least(F.floor(F.col("gap") / 7), F.lit(_GAP_CAP)).alias("week_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap").alias("min_gap"),
        F.max("gap").alias("max_gap"),
    )
    w_cum = Window.partitionBy().orderBy("week_bucket")
    w_all = Window.partitionBy()
    return hist.select(
        "week_bucket", "n_gaps", "min_gap", "max_gap",
        r6(
            F.sum("n_gaps").over(w_cum).cast("double")
            / F.sum("n_gaps").over(w_all).cast("double")
        ).alias("cum_share"),
    )


# Exact revenue in 1e-4 units (the composite _REV_SQL discipline).
_REV_UNITS = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "q_nation_hhi",
    oracle=f"""
        WITH su AS (
            SELECT s_nationkey AS nk, l_suppkey AS sk,
                   CAST(sum({_REV_UNITS}) AS BIGINT) AS u
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2
        ),
        m AS (
            SELECT nk,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(u) AS HUGEINT) AS tot,
                   CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS sq,
                   CAST(max(u) AS HUGEINT) AS mx
            FROM su GROUP BY 1
        )
        SELECT n_name AS nation, n_suppliers,
               round(CAST(tot AS DOUBLE) / 1e4, 2) AS revenue,
               round(CAST(sq AS DOUBLE)
                     / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
               round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS top_share
        FROM m JOIN nation ON nk = n_nationkey
    """,
    origin="CORE",
    doc="Herfindahl-Hirschman supplier-concentration index per nation: "
        "HHI = Σᵢ shareᵢ² computed as Σuᵢ²/U² on EXACT integer revenue "
        "units — summing share² doubles would make the result depend on "
        "partition reduction order; Σu² stays exact in decimal(38,0)/"
        "HUGEINT (u ~ 1e13 at 100 TB ⇒ u² ~ 1e26, Σ ~ 1e32 ≪ 1e38). "
        "top_share = max(u)/U needs no rank window. Scale shape: one "
        "map-side-combined fact shuffle onto |nation×supplier| cells, a "
        "second onto 25 nation rows, then a 25-row broadcast join for "
        "names.",
)
def q_nation_hhi(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.sum(F.expr(_REV_UNITS)).alias("u"))
    )
    m = per_supp.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("u").cast(_D38).alias("tot"),
        F.sum(F.col("u").cast(_D38) * F.col("u")).alias("sq"),
        F.max("u").cast(_D38).alias("mx"),
    )
    tot_d = F.col("tot").cast("double")
    return (
        m.join(F.broadcast(na), m["nk"] == na["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.round(tot_d / 1e4, 2).alias("revenue"),
            r6(F.col("sq").cast("double") / (tot_d * tot_d)).alias("hhi"),
            r6(F.col("mx").cast("double") / tot_d).alias("top_share"),
        )
    )


@register(
    "q_events_peaks",
    oracle=f"""
        WITH {_DAILY_SQL},
        pk AS (
            SELECT a.event_type, a.y
            FROM xy a
            JOIN xy b ON a.event_type = b.event_type AND a.x = b.x + 1
            JOIN xy c ON a.event_type = c.event_type AND a.x = c.x - 1
            WHERE a.y > b.y AND a.y > c.y
        ),
        n AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM xy GROUP BY 1
        ),
        p AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_peaks,
                   CAST(max(y) AS BIGINT) AS max_peak
            FROM pk GROUP BY 1
        )
        SELECT n.event_type, n.n_days,
               coalesce(p.n_peaks, 0) AS n_peaks,
               round(CAST(coalesce(p.n_peaks, 0) AS DOUBLE)
                     / CAST(n.n_days AS DOUBLE), 6) AS peak_rate,
               p.max_peak
        FROM n LEFT JOIN p ON n.event_type = p.event_type
    """,
    origin="CORE",
    doc="Local-maximum (peak) census of each type's daily-count series: "
        "a day is a peak when strictly above BOTH calendar neighbors — "
        "neighbors come from two equi self-joins on (type, x±1), so day "
        "gaps disqualify a row rather than silently comparing against a "
        "non-adjacent day (the lag/lead-over-observed-rows bug). Output "
        "per type: day count, peak count, peak rate, tallest peak "
        "(NULL when the series is monotone). All integer until the one "
        "rounded ratio. Scale shape: one fact shuffle onto |types×days| "
        "cells; joins + census on that bounded aggregate.",
)
def q_events_peaks(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    a, b, c = xy.alias("a"), xy.alias("b"), xy.alias("c")
    pk = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.x") == F.col("b.x") + 1),
        )
        .join(
            c,
            (F.col("a.event_type") == F.col("c.event_type"))
            & (F.col("a.x") == F.col("c.x") - 1),
        )
        .filter((F.col("a.y") > F.col("b.y")) & (F.col("a.y") > F.col("c.y")))
        .select(F.col("a.event_type").alias("event_type"), F.col("a.y").alias("y"))
    )
    n = xy.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    p = pk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_peaks"), F.max("y").alias("max_peak")
    )
    return (
        n.join(p.withColumnRenamed("event_type", "pt"),
               n["event_type"] == F.col("pt"), "left")
        .select(
            "event_type", "n_days",
            F.coalesce("n_peaks", F.lit(0).cast("long")).alias("n_peaks"),
            r6(
                F.coalesce("n_peaks", F.lit(0)).cast("double")
                / F.col("n_days").cast("double")
            ).alias("peak_rate"),
            "max_peak",
        )
    )


@register(
    "q_events_hourly",
    oracle="""
        WITH cell AS (
            SELECT event_type,
                   CAST(date_part('hour', ts) AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hour, n,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER (PARTITION BY event_type)
                            AS DOUBLE), 6) AS share,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, hour) = 1 AS is_peak
        FROM cell
    """,
    origin="CORE",
    doc="Hour-of-day load profile per event type with the peak hour "
        "flagged — the capacity-planning heat strip. Peak = row_number 1 "
        "ordered (n DESC, hour) so count ties break on the earlier hour "
        "identically in both engines (max_by/arg_max tie behavior is "
        "engine-defined — the reason this is a window, not arg_max). "
        "Scale shape: one map-side-combined fact shuffle onto the "
        "bounded |types×24| grid; share + peak windows run over that "
        "grid only.",
)
def q_events_hourly(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_type = Window.partitionBy("event_type")
    w_peak = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), "hour"
    )
    return cell.select(
        "event_type", "hour", "n",
        r6(
            F.col("n").cast("double") / F.sum("n").over(w_type).cast("double")
        ).alias("share"),
        (F.row_number().over(w_peak) == 1).alias("is_peak"),
    )


@register(
    "q_events_first_touch",
    oracle="""
        WITH first AS (
            SELECT user_id, event_type
            FROM (SELECT user_id, event_type,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn = 1
        ),
        conv AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT f.event_type AS first_touch,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(c.user_id) AS BIGINT) AS n_converted,
               round(CAST(count(c.user_id) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS cvr
        FROM first f LEFT JOIN conv c ON f.user_id = c.user_id
        GROUP BY 1
    """,
    origin="CORE",
    doc="First-touch attribution: each user's entry event type (first "
        "row per user by (ts, event_id) — the event_id tie-break makes "
        "same-instant ordering deterministic) vs whether they ever "
        "purchased; conversion rate per entry channel. Scale shape: "
        "first-touch and the purchase-user distinct are BOTH single "
        "key-hash shuffles on user_id, so the left join is co-"
        "partitioned (no third shuffle under AQE); final rollup onto "
        "|types| rows.",
)
def q_events_first_touch(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.select("user_id", "event_type", F.row_number().over(w_u).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("cu"))
        .distinct()
    )
    return (
        first.join(conv, first["user_id"] == F.col("cu"), "left")
        .groupBy(F.col("event_type").alias("first_touch"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("cu").alias("n_converted"),
            r6(
                F.count("cu").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("cvr"),
        )
    )


@register(
    "q_events_mad",
    oracle=f"""
        WITH {_DAILY_SQL},
        med AS (
            SELECT event_type, quantile_cont(y, 0.5) AS med
            FROM xy GROUP BY 1
        ),
        dev AS (
            SELECT xy.event_type, xy.y, med.med,
                   abs(CAST(xy.y AS DOUBLE) - med.med) AS ad
            FROM xy JOIN med ON xy.event_type = med.event_type
        ),
        mad AS (
            SELECT event_type, med, quantile_cont(ad, 0.5) AS mad
            FROM dev GROUP BY 1, 2
        )
        SELECT dev.event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               round(mad.med, 2) AS med_daily,
               round(mad.mad, 2) AS mad_daily,
               CAST(count(*) FILTER (dev.ad > 3.0 * 1.4826 * mad.mad)
                    AS BIGINT) AS n_outlier_days
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY dev.event_type, mad.med, mad.mad
    """,
    origin="CORE",
    doc="Robust (median/MAD) anomaly scan of each type's daily series — "
        "the outlier screen that, unlike the mean/std z-score "
        "(q_events_anomaly), is not itself dragged by the outliers it "
        "hunts. Median and MAD by exact interpolated percentile over "
        "the |days|-bounded per-type group; flag = |y−med| > 3·1.4826·"
        "MAD (the Gaussian-consistent fence), all doubles derived from "
        "identical integers. Scale shape: everything after the ONE "
        "pinned fact aggregate (|types×days| cells, localCheckpoint) "
        "runs on bounded rows: two percentile passes + one FILTERed "
        "rollup, joins on the ≤|types| key.",
)
def q_events_mad(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    med = xy.groupBy("event_type").agg(
        F.percentile("y", F.lit(0.5)).alias("med")
    )
    dev = xy.join(F.broadcast(med), "event_type").select(
        "event_type", "med",
        F.abs(F.col("y").cast("double") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.drop("med")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.count(
                F.when(F.col("ad") > 3.0 * 1.4826 * F.col("mad"), 1)
            ).alias("n_outlier_days"),
        )
        .select(
            "event_type", "n_days",
            F.round("med", 2).alias("med_daily"),
            F.round("mad", 2).alias("mad_daily"),
            "n_outlier_days",
        )
    )


@register(
    "q_events_lifecycle",
    oracle="""
        WITH per_user AS (
            SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY 1
        ),
        corpus AS (SELECT max(ts) AS max_ts FROM events),
        staged AS (
            SELECT (epoch_us(last_ts) - epoch_us(first_ts))
                       // 3600000000 AS tenure_h,
                   (epoch_us(max_ts) - epoch_us(last_ts))
                       // 3600000000 AS recency_h
            FROM per_user, corpus
        )
        SELECT CASE WHEN recency_h >= 24 THEN 'churned'
                    WHEN recency_h >= 12 THEN 'dormant'
                    WHEN tenure_h < 168 THEN 'new'
                    ELSE 'active' END AS stage,
               CAST(count(*) AS BIGINT) AS n_users,
               round(CAST(count(*) AS DOUBLE)
                     / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share,
               round(CAST(sum(tenure_h) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS avg_tenure_hours
        FROM staged
        GROUP BY 1
    """,
    origin="CORE",
    doc="User lifecycle staging: tenure (first→last event) × recency "
        "(last event→corpus max) in WHOLE HOURS of exact integer "
        "microseconds classify each user as new (tenure < 7 d) / active "
        "/ dormant (12–23 h idle) / churned (24+ h) — the two-axis "
        "segmentation behind every growth dashboard (q_events_churn "
        "sees only the recency axis; thresholds sized to the feed's "
        "sub-day cadence). Integer hour buckets mean no float can flip "
        "a stage between engines. Scale shape: ONE per-user "
        "map-side-combined aggregate + a 1-row corpus-max broadcast, "
        "then a rollup onto 4 stage rows; the share window runs over "
        "those 4 rows.",
)
def q_events_lifecycle(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    corpus = ev.agg(F.max("ts").alias("max_ts"))
    staged = per_user.crossJoin(F.broadcast(corpus)).select(
        F.expr(
            "(unix_micros(last_ts) - unix_micros(first_ts)) DIV 3600000000"
        ).alias("tenure_h"),
        F.expr(
            "(unix_micros(max_ts) - unix_micros(last_ts)) DIV 3600000000"
        ).alias("recency_h"),
    )
    stage = (
        F.when(F.col("recency_h") >= 24, "churned")
        .when(F.col("recency_h") >= 12, "dormant")
        .when(F.col("tenure_h") < 168, "new")
        .otherwise("active")
    )
    agg = staged.groupBy(stage.alias("stage")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("tenure_h").alias("tenure_sum"),
    )
    w_all = Window.partitionBy()
    return agg.select(
        "stage", "n_users",
        r6(
            F.col("n_users").cast("double")
            / F.sum("n_users").over(w_all).cast("double")
        ).alias("share"),
        r6(
            F.col("tenure_sum").cast("double") / F.col("n_users").cast("double")
        ).alias("avg_tenure_hours"),
    )


@register(
    "q_events_next_entropy",
    oracle="""
        WITH tc AS (
            SELECT prev_type AS src, event_type AS nxt,
                   CAST(count(*) AS BIGINT) AS k
            FROM (SELECT event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                             AS prev_type
                  FROM events)
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT src,
               CAST(sum(k) AS BIGINT) AS n_transitions,
               CAST(count(*) AS BIGINT) AS n_next_types,
               round(log2(CAST(sum(k) AS DOUBLE))
                     - CAST(sum(CAST(k AS HUGEINT) * CAST(round(
                           log2(CAST(k AS DOUBLE)) * 1e6) AS HUGEINT))
                           AS DOUBLE) / 1e6 / CAST(sum(k) AS DOUBLE), 6)
                   AS next_entropy_bits,
               round(pow(2.0,
                     round(log2(CAST(sum(k) AS DOUBLE))
                           - CAST(sum(CAST(k AS HUGEINT) * CAST(round(
                                 log2(CAST(k AS DOUBLE)) * 1e6) AS HUGEINT))
                                 AS DOUBLE) / 1e6 / CAST(sum(k) AS DOUBLE),
                           6)), 6) AS perplexity
        FROM tc GROUP BY src
    """,
    origin="CORE",
    doc="Next-event uncertainty per state: Shannon entropy (and "
        "perplexity 2^H) of each event type's next-type distribution — "
        "how predictable the journey is FROM each state, the per-state "
        "drill-down the Markov stationary mix (q_events_markov) "
        "averages away. Same algebraic entropy form as "
        "q_part_assortment (k·log2 k in 1e-6 fixed point before the "
        "weighted sum — partition-order-exact); perplexity exponentiates "
        "the ALREADY-6-dp-ROUNDED entropy so both engines pow identical "
        "doubles. Scale shape: the heavy step is the ONE per-user "
        "lag window (key-hash shuffle, the q_events_markov discipline); "
        "entropy runs over the ≤|types|² transition aggregate.",
)
def q_events_next_entropy(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tc = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w_u).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("nxt")
        )
        .agg(F.count(F.lit(1)).alias("k"))
    )
    term = F.col("k").cast(_D38) * F.round(
        F.log2(F.col("k").cast("double")) * 1e6
    ).cast(_D38)
    m = tc.groupBy("src").agg(
        F.sum("k").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.sum(term).alias("wlog"),
    )
    ent = F.round(
        F.log2(F.col("n_transitions").cast("double"))
        - F.col("wlog").cast("double")
        / 1e6
        / F.col("n_transitions").cast("double"),
        6,
    )
    return m.select(
        "src", "n_transitions", "n_next_types",
        ent.alias("next_entropy_bits"),
        r6(F.pow(F.lit(2.0), ent)).alias("perplexity"),
    )


@register(
    "q_value_impute",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(value) AS BIGINT) AS n_present,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1
        ),
        filled AS (
            SELECT e.event_type,
                   coalesce(CAST(round(e.value * 100) AS BIGINT),
                            s.cents // s.n_present) AS vc
            FROM events e JOIN stats s ON e.event_type = s.event_type
        )
        SELECT stats.event_type,
               n, n - n_present AS n_imputed,
               round(CAST(cents // n_present AS DOUBLE) / 100, 2)
                   AS fill_value,
               round(CAST(f.total AS DOUBLE) / CAST(n AS DOUBLE) / 100, 6)
                   AS mean_after
        FROM stats
        JOIN (SELECT event_type, CAST(sum(vc) AS BIGINT) AS total
              FROM filled GROUP BY 1) f
             ON f.event_type = stats.event_type
    """,
    origin="CORE",
    doc="Mean-imputation QA report — the feature-engineering fill "
        "(null metric values replaced by the per-type mean) with the "
        "audit columns a pipeline logs: rows, imputed count, the fill "
        "value, and the post-fill mean. The fill value is the EXACT "
        "integer floor-division cents//n_present (a float mean would "
        "re-round differently per engine), so the post-fill sum is an "
        "exact integer in both dialects. Scale shape: one stats "
        "aggregate (map-side combined, |types| rows) broadcast back "
        "over the fact for the fill, one more rollup — the "
        "aggregate-broadcast-rescan shape of q_events_anomaly, "
        "two fact passes total.",
)
def q_value_impute(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_present"),
        F.sum(vc).alias("cents"),
    )
    fill = F.floor(F.col("cents") / F.col("n_present")).cast("long")
    filled = ev.join(F.broadcast(stats), "event_type").select(
        "event_type", F.coalesce(vc, fill).alias("vc")
    )
    total = filled.groupBy("event_type").agg(F.sum("vc").alias("total"))
    return (
        stats.join(total, "event_type")
        .select(
            "event_type", "n",
            (F.col("n") - F.col("n_present")).alias("n_imputed"),
            F.round(fill.cast("double") / 100, 2).alias("fill_value"),
            r6(
                F.col("total").cast("double") / F.col("n").cast("double") / 100
            ).alias("mean_after"),
        )
    )


@register(
    "q_events_cusum",
    oracle=f"""
        WITH {_DAILY_SQL},
        tot AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(y) AS BIGINT) AS ty,
                   CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                       AS syy
            FROM xy GROUP BY 1
        ),
        run AS (
            SELECT xy.event_type, x, y, nd, ty, syy,
                   CAST(sum(y) OVER (PARTITION BY xy.event_type ORDER BY x)
                        AS BIGINT) AS cum,
                   CAST(row_number() OVER (PARTITION BY xy.event_type
                                           ORDER BY x) AS BIGINT) AS k
            FROM xy JOIN tot ON xy.event_type = tot.event_type
        )
        SELECT event_type, x AS day_x, y,
               round(CAST(nd * cum - k * ty AS DOUBLE)
                     / CAST(nd AS DOUBLE), 6) AS cusum,
               CAST(nd * cum - k * ty AS DECIMAL(38,0))
                   * CAST(nd * cum - k * ty AS DECIMAL(38,0))
                   > 9 * nd * (nd * syy - CAST(ty AS DECIMAL(38,0)) * ty)
                   AS drifted
        FROM run
    """,
    doc="CUSUM drift detection per event-type daily series: the running "
        "sum of deviations from the series mean, S_k = Σ_{i≤k}(y_i − ȳ), "
        "with a 3σ drift flag. Every decision is EXACT integer "
        "arithmetic — S_k is computed as (n·cum_k − k·total)/n and the "
        "flag compares (n·cum_k − k·total)² against 9·n·(n·Σy² − total²) "
        "in decimal(38,0), so no engine's float rounding can flip a "
        "boundary day. Scale shape: the fact table collapses to the "
        "|types×days| aggregate in one map-side-combined shuffle (shared "
        "via the pinned _daily_xy scan); the cumulative window partitions "
        "by event_type over calendar-bounded rows.",
)
def q_events_cusum(spark, sf_dir):
    xy = _daily_xy(spark, sf_dir)
    tot = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("y").cast("long").alias("ty"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).cast(_D38).alias("syy"),
    )
    w = Window.partitionBy("event_type").orderBy("x")
    run = xy.join(tot, "event_type").select(
        "event_type", "x", "y", "nd", "ty", "syy",
        F.sum("y").over(w).cast("long").alias("cum"),
        F.row_number().over(w).cast("long").alias("k"),
    )
    s_scaled = F.col("nd") * F.col("cum") - F.col("k") * F.col("ty")
    return run.select(
        "event_type",
        F.col("x").alias("day_x"),
        "y",
        F.round(
            s_scaled.cast("double") / F.col("nd").cast("double"), 6
        ).alias("cusum"),
        (
            s_scaled.cast(_D38) * s_scaled.cast(_D38)
            > 9
            * F.col("nd").cast(_D38)
            * (
                F.col("nd").cast(_D38) * F.col("syy")
                - F.col("ty").cast(_D38) * F.col("ty")
            )
        ).alias("drifted"),
    )


@register(
    "q_events_holt",
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS vc
            FROM events WHERE value IS NOT NULL GROUP BY 1
        ), idx AS (
            SELECT d, vc, row_number() OVER (ORDER BY d) AS i FROM daily
        ), rec AS (
            SELECT i, d, CAST(vc AS DOUBLE) / 100.0 AS l,
                   CAST(0.0 AS DOUBLE) AS b
            FROM idx WHERE i = 1
            UNION ALL
            SELECT nx.i, nx.d,
                   0.5 * (CAST(nx.vc AS DOUBLE) / 100.0)
                   + 0.5 * (rec.l + rec.b),
                   0.5 * ((0.5 * (CAST(nx.vc AS DOUBLE) / 100.0)
                           + 0.5 * (rec.l + rec.b)) - rec.l)
                   + 0.5 * rec.b
            FROM rec JOIN idx nx ON nx.i = rec.i + 1
        )
        SELECT d, round(l, 6) AS level, round(b, 6) AS trend
        FROM rec
    """,
    doc="Holt double (level+trend) exponential smoothing of the daily "
        "event-value series, alpha = beta = 1/2 — the trend-aware upgrade "
        "of q_events_ewma for forecast-based alerting. The recurrence "
        "l_t = aly_t+(1-al)(l+b), b_t = be(l_t-l)+(1-be)b is inherently "
        "sequential (NOT associative — no shuffle-parallel form exists), "
        "so the house discipline applies: the FACT scan collapses "
        "map-side to the calendar-bounded |days| series (~2.4k rows at "
        "ANY SF), and only that bounded series runs the recurrence — one "
        "Arrow-batched applyInPandas group doing a strictly O(days) "
        "sequential pass (VERDICT r9 #4: the previous HOF fold grew its "
        "trajectory arrays via concat per step — O(days²) memcpy). "
        "Determinism: inputs are exact integer cents; CPython floats ARE "
        "IEEE doubles and the recurrence is written in the same "
        "operation order as DuckDB's recursive CTE, so every step is the "
        "same sequence of correctly-rounded *, +, - ops → bit-identical "
        "trajectories; 6-dp rounding stays JVM-side (F.round == DuckDB "
        "round on these values). Init is declared: l_1 = y_1, b_1 = 0.",
)
def q_events_holt(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("d").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"d": pdf["d"], "level": [], "trend": []}
            )
        vc = pdf["vc"].to_numpy(np.int64)
        lvl = np.empty(n, dtype=np.float64)
        trd = np.empty(n, dtype=np.float64)
        # Same op order as the oracle's recursive CTE: each step is the
        # identical sequence of IEEE-754 ops on exact-cent inputs.
        l = float(vc[0]) / 100.0
        b = 0.0
        lvl[0], trd[0] = l, b
        for t in range(1, n):
            y = float(vc[t]) / 100.0
            nl = 0.5 * y + 0.5 * (l + b)
            nb = 0.5 * (nl - l) + 0.5 * b
            l, b = nl, nb
            lvl[t], trd[t] = l, b
        return pd.DataFrame({"d": pdf["d"], "level": lvl, "trend": trd})

    raw = (
        daily.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(_holt, "d date, level double, trend double")
    )
    return raw.select(
        "d",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
    )


@register(
    "q_events_decompose",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ), ser AS (
            SELECT s.h, coalesce(hourly.cnt, 0) AS cnt
            FROM spine s LEFT JOIN hourly ON s.h = hourly.h
        ), tr AS (
            SELECT h, cnt,
                   sum(cnt) OVER (ORDER BY h
                       ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS t24,
                   count(*) OVER (ORDER BY h
                       ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS nfr
            FROM ser
        )
        SELECT CAST(hour(h) AS BIGINT) AS hod,
               CAST(count(*) AS BIGINT) AS n_obs,
               round(CAST(sum(24 * cnt - t24) AS DOUBLE)
                     / (24.0 * count(*)), 6) AS seasonal
        FROM tr WHERE nfr = 24
        GROUP BY 1
    """,
    doc="Classical seasonal decomposition of hourly event volume "
        "(moving-average STL: trend = centered 24-hour MA, seasonal = "
        "hour-of-day mean of the detrended series) — the profile that "
        "separates 'traffic always dips at 4am' from real drift, feeding "
        "the same monitors as q_events_dow_profile but detrended so a "
        "growth ramp cannot masquerade as seasonality. The fact scan "
        "collapses map-side onto the calendar-bounded hourly grid; a "
        "generated hour SPINE left-joins the counts so empty hours are "
        "true zeros, not missing rows that would shear the rows-based MA "
        "frame. Exact-integer internals: the centered MA is kept as the "
        "un-divided frame sum t24, the detrended value as the integer "
        "24*cnt - t24 (x24 clears the /24), summed per hour-of-day in "
        "BIGINT; ONE final division by 24*n per bucket, 6-dp. Edge hours "
        "with partial frames (first 11 / last 12) are excluded by exact "
        "frame count, per the classical procedure. The single-partition "
        "window runs over the bounded hourly grid (~17k rows for two "
        "years), never the fact.",
)
def q_events_decompose(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("lo"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    )
    ser = spine.join(hourly, "h", "left").select(
        "h", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    # Bounded hourly grid from here on: single-partition frames intended.
    wf = Window.orderBy("h").rowsBetween(-11, 12)
    tr = ser.select(
        "h",
        "cnt",
        F.sum("cnt").over(wf).alias("t24"),
        F.count(F.lit(1)).over(wf).alias("nfr"),
    ).filter(F.col("nfr") == 24)
    return tr.groupBy(F.hour("h").cast("long").alias("hod")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.round(
            F.sum(24 * F.col("cnt") - F.col("t24")).cast("double")
            / (24.0 * F.count(F.lit(1))),
            6,
        ).alias("seasonal"),
    )


# Fixed-point weekly DFT basis: round(1e6·cos/sin(2πt/7)) for t mod 7,
# hardcoded as integer literals so NO libm call can differ between engines
# — the basis is exact by construction, not by rounding truce.
_COS7 = [1000000, 623490, -222521, -900969, -900969, -222521, 623490]
_SIN7 = [0, 781831, 974928, 433884, -433884, -974928, -781831]
_COS7_SQL = "CASE (t % 7) " + " ".join(
    f"WHEN {i} THEN {v}" for i, v in enumerate(_COS7)
) + " END"
_SIN7_SQL = "CASE (t % 7) " + " ".join(
    f"WHEN {i} THEN {v}" for i, v in enumerate(_SIN7)
) + " END"


@register(
    "q_events_periodogram",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1
        ), idx AS (
            SELECT CAST(d - (SELECT min(d) FROM daily) AS BIGINT) AS t, y
            FROM daily
        ), win AS (
            SELECT t, y, {_COS7_SQL} AS c, {_SIN7_SQL} AS s
            FROM idx, (SELECT 7 * (count(*) // 7) AS n7 FROM idx) lim
            WHERE t < lim.n7
        ), m AS (
            SELECT CAST(count(*) AS DECIMAL(38,0)) AS n7,
                   CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                   sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                   sum(CAST(y AS DECIMAL(38,0)) * c) AS a,
                   sum(CAST(y AS DECIMAL(38,0)) * s) AS b,
                   sum(CAST(c AS DECIMAL(38,0)) * c) AS cc,
                   sum(CAST(s AS DECIMAL(38,0)) * s) AS ss
            FROM win
        )
        SELECT CAST(n7 AS BIGINT) AS n_days,
               round(
                   (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                        / CAST(cc AS DOUBLE)
                    + CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
                        / CAST(ss AS DOUBLE))
                   / (CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                        / CAST(n7 AS DOUBLE)),
                   6) AS weekly_r2
        FROM m
    """,
    doc="Weekly-periodicity detector: fraction of daily-volume variance "
        "explained by the 1/7-frequency Fourier pair — the signal that "
        "tells a capacity planner 'this series has a weekly cycle' before "
        "any seasonal model is fitted (q_events_decompose profiles the "
        "shape; this scores its strength). The DFT basis is FIXED-POINT "
        "integer constants (round(1e6·cos/sin(2πt/7)) hardcoded per t mod "
        "7 — no libm call exists to differ between engines); the series "
        "is truncated to complete weeks so the declared estimator "
        "R² = (a²/Σc² + b²/Σs²)/(Σy²−(Σy)²/n) needs no mean-centering of "
        "the basis. All seven moments accumulate exactly in decimal(38,0) "
        "(a ~ 1e6·Σy reaches 4e17 at 1.5e11 orders — int64 is gone); the "
        "final combination runs in double (a²·Σs² ~ 1e48 exceeds any "
        "fixed decimal), identical expression tree, 6 dp. Scale shape: "
        "ONE map-side-combined |days| histogram off the fact scan; "
        "everything after is a ~2.4k-row bounded fold.",
)
def q_events_periodogram(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    wmin = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        F.datediff(F.col("d"), F.min("d").over(wmin)).cast("long").alias("t"),
        "y",
        F.count(F.lit(1)).over(wmin).alias("nd"),
    )
    cos_expr = F.expr(_COS7_SQL)
    sin_expr = F.expr(_SIN7_SQL)
    win = idx.filter(F.col("t") < 7 * F.expr("nd DIV 7")).select(
        "t", "y", cos_expr.alias("c"), sin_expr.alias("s")
    )
    m = win.agg(
        F.count(F.lit(1)).cast(_D38).alias("n7"),
        F.sum("y").cast(_D38).alias("sy"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).alias("syy"),
        F.sum(F.col("y").cast(_D38) * F.col("c")).alias("a"),
        F.sum(F.col("y").cast(_D38) * F.col("s")).alias("b"),
        F.sum(F.col("c").cast(_D38) * F.col("c")).alias("cc"),
        F.sum(F.col("s").cast(_D38) * F.col("s")).alias("ss"),
    )
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    return m.select(
        F.col("n7").cast("long").alias("n_days"),
        F.round(
            (
                ad * ad / F.col("cc").cast("double")
                + bd * bd / F.col("ss").cast("double")
            )
            / (
                F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double")
                / F.col("n7").cast("double")
            ),
            6,
        ).alias("weekly_r2"),
    )


@register(
    "q_orders_forecast_eval",
    oracle="""
        WITH monthly AS (
            SELECT o_orderpriority AS prio,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1, 2
        ), f AS (
            SELECT prio, mon, rev,
                   lag(rev, 1) OVER (PARTITION BY prio ORDER BY mon)
                       AS f_naive,
                   lag(rev, 12) OVER (PARTITION BY prio ORDER BY mon)
                       AS f_snaive
            FROM monthly
        )
        SELECT prio,
               CAST(count(*) AS BIGINT) AS n_eval,
               round(CAST(sum(abs(rev - f_naive)) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) AS wape_naive,
               round(CAST(sum(abs(rev - f_snaive)) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) AS wape_snaive
        FROM f
        WHERE f_naive IS NOT NULL AND f_snaive IS NOT NULL
        GROUP BY 1
    """,
    doc="Forecast backtest over the monthly revenue series per order "
        "priority: WAPE (Σ|error|/Σ|actual|) of the one-month-naive "
        "forecast vs the seasonal-naive (lag-12) forecast — the benchmark "
        "pair every demand-forecasting system must beat before it earns "
        "its keep (the M-competition baseline discipline); snaive "
        "beating naive IS the yearly-seasonality detector. Both "
        "forecasts are lag windows over the calendar-bounded "
        "≤|priorities|×|months| aggregate; the evaluation window is the "
        "lag-12-complete suffix (both forecasts non-null), so both "
        "models are scored on identical months. WAPE is a ratio of two "
        "exact integer-cent sums — no per-point percentage (MAPE's "
        "divide-by-small-actual instability), ONE division at 6 dp. "
        "Scale shape: one map-side-combined fact shuffle onto the "
        "monthly calendar; per-priority lag windows over ≤84 rows.",
)
def q_orders_forecast_eval(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("mon"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("rev")
    )
    w = Window.partitionBy("prio").orderBy("mon")
    f = monthly.select(
        "prio",
        "rev",
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.lag("rev", 12).over(w).alias("f_snaive"),
    ).filter(F.col("f_naive").isNotNull() & F.col("f_snaive").isNotNull())
    return f.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(
            F.sum(F.abs(F.col("rev") - F.col("f_naive"))).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("wape_naive"),
        F.round(
            F.sum(F.abs(F.col("rev") - F.col("f_snaive"))).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("wape_snaive"),
    )


@register(
    "q_events_freshness",
    oracle="""
        WITH per_type AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_total,
                   max(ts) AS last_ts,
                   CAST(count(*) FILTER (
                       WHERE ts >= date_trunc('day', (SELECT max(ts)
                                                      FROM events))
                   ) AS BIGINT) AS n_last_day,
                   CAST(date_trunc('day', max(ts))
                        - date_trunc('day', min(ts)) AS BIGINT) + 1
                       AS n_days
            FROM events GROUP BY 1
        ), g AS (SELECT max(last_ts) AS global_max FROM per_type)
        SELECT event_type,
               n_total,
               CAST((epoch_us(global_max) - epoch_us(last_ts)) // 60000000
                    AS BIGINT) AS lag_min,
               CASE WHEN epoch_us(global_max) - epoch_us(last_ts)
                         < CAST(3600000000 AS BIGINT) THEN 'fresh'
                    WHEN epoch_us(global_max) - epoch_us(last_ts)
                         < CAST(86400000000 AS BIGINT) THEN 'lagging'
                    ELSE 'stale' END AS staleness,
               round(CAST(n_last_day AS DOUBLE)
                     / (CAST(n_total AS DOUBLE) / n_days), 6)
                   AS last_day_volume_ratio
        FROM per_type, g
    """,
    doc="Per-feed freshness audit — the first page of every pipeline "
        "dashboard: how far behind the most recent arrival is each event "
        "type (lag vs the global high-water mark, classed fresh/<1h, "
        "lagging/<24h, stale), and whether its final-day volume is "
        "collapsing (last-day count vs lifetime daily average — a feed "
        "can be 'fresh' yet silently 90% down). The staleness class "
        "compares exact integer microsecond differences (no float "
        "timestamp math can flip a boundary); the volume ratio is one "
        "division of exact counts at 6 dp. Scale shape: ONE map-side-"
        "combined aggregate onto |event_types| rows off the fact scan "
        "(min/max/count combine associatively); the global high-water "
        "mark is a 1-row broadcast fold back over the bounded type "
        "table. The last-day count rides the SAME aggregate via a "
        "conditional count against the broadcast day bound.",
)
def q_events_freshness(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    gmax = ev.agg(
        F.date_trunc("day", F.max("ts")).alias("gday"),
        F.max("ts").alias("global_max"),
    )
    per_type = (
        ev.join(F.broadcast(gmax))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.max("ts").alias("last_ts"),
            F.sum(F.when(F.col("ts") >= F.col("gday"), 1).otherwise(0))
            .cast("long")
            .alias("n_last_day"),
            (
                F.datediff(
                    F.date_trunc("day", F.max("ts")),
                    F.date_trunc("day", F.min("ts")),
                ).cast("long")
                + 1
            ).alias("n_days"),
            F.max(F.col("global_max")).alias("global_max"),
        )
    )
    lag_us = F.unix_micros(F.col("global_max")) - F.unix_micros(
        F.col("last_ts")
    )
    return per_type.select(
        "event_type",
        "n_total",
        F.expr(
            "(unix_micros(global_max) - unix_micros(last_ts)) DIV 60000000"
        ).alias("lag_min"),
        F.when(lag_us < 60 * 60000000, "fresh")
        .when(lag_us < 24 * 60 * 60000000, "lagging")
        .otherwise("stale")
        .alias("staleness"),
        F.round(
            F.col("n_last_day").cast("double")
            / (F.col("n_total").cast("double") / F.col("n_days")),
            6,
        ).alias("last_day_volume_ratio"),
    )


_ATTR_E6 = 1_000_000  # fixed-point credit grain


@register(
    "q_events_attribution_linear",
    oracle=f"""
        WITH purch AS (
            SELECT user_id, event_id AS p_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ), touch AS (
            SELECT user_id, event_type, ts AS t_ts
            FROM events WHERE event_type <> 'purchase'
        ), j AS (
            SELECT p.p_id, t.event_type
            FROM purch p JOIN touch t
              ON t.user_id = p.user_id
             AND t.t_ts < p.p_ts
             AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR
        ), sized AS (
            SELECT p_id, event_type,
                   count(*) OVER (PARTITION BY p_id) AS n
            FROM j
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
               round(CAST(sum({_ATTR_E6} // n) AS DOUBLE)
                     / {_ATTR_E6}, 6) AS credit
        FROM sized
        GROUP BY 1
    """,
    origin="CORE",
    doc="Linear multi-touch attribution — the equal-credit counterpart "
        "of q_events_first_touch: every non-purchase touch in the hour "
        "before a purchase (the q_events_funnel window convention) "
        "splits that conversion's credit equally. Determinism: the "
        f"per-touch share is fixed-pointed as {_ATTR_E6} DIV n (exact "
        "integer division — the summed credit is an integer total on "
        "any partitioning; the documented floor bias is < n/1e6 of a "
        "conversion and identical in both engines), divided back once "
        "at the end. Scale shape: the touch⋈purchase pairing is a "
        "user-keyed equi join with a time-range predicate (never a "
        "time-theta join across users), the per-conversion size is a "
        "window ON THE PAIRED ROWS keyed by purchase id, and the rollup "
        "is map-side-combined onto |types| rows.",
)
def q_events_attribution_linear(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", F.col("ts").alias("t_ts")
    )
    j = touch.join(
        purch,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("p_id", "event_type")
    sized = j.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("p_id"))
    )
    return sized.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("p_id").alias("n_conversions"),
        # `div`, not floor(double /): true integer division matches the
        # oracle's `//` bit-for-bit with no near-integer double hazard.
        F.round(
            F.sum(F.expr(f"{_ATTR_E6} div n")).cast("double") / _ATTR_E6,
            6,
        ).alias("credit"),
    )
