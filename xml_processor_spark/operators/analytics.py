"""Reshaping & behavioral analytics (SURVEY §2.L) — pivot/unpivot,
deterministic sampling, funnel and cohort-retention analysis.

Pivot compiles to a single hash aggregation with one conditional-aggregate
column per pinned pivot value (no per-value pass); unpivot is a zero-shuffle
Expand node. Sampling is content-hash-based (md5 threshold), never
``rand()`` — reproducible across engines, partitionings, and reruns, which
is what a 100 TB training-data pipeline needs for held-out splits. Funnel
and retention each resolve to two hash aggregations over `events` with the
per-user reduction done map-side first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import cents, dsum, dsum_sql, r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

# Pinned pivot domain (FIXTURES.md: o_orderstatus ∈ {F,O,P}). Pinning the
# values keeps the plan a single aggregation — letting Spark discover them
# would add a distinct-collect driver round-trip, pointless at 100 TB.
_STATUSES = ("F", "O", "P")


def _pivot_cols_sql() -> str:
    cols = []
    for s in _STATUSES:
        rev = dsum_sql(
            f"CASE WHEN o_orderstatus = '{s}' THEN o_totalprice ELSE 0 END"
        )
        cols.append(
            f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s.lower()}, "
            f"{rev} AS rev_{s.lower()}"
        )
    return ", ".join(cols)


@register(
    "q_pivot_status",
    oracle=f"""
        SELECT o_orderpriority, {_pivot_cols_sql()}
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Pivot orders to wide form: per priority, one (count, exact revenue "
        "sum) column pair per order status — single hash aggregation with "
        "pinned pivot values.",
)
def q_pivot_status(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    aggs = []
    for s in _STATUSES:
        hit = F.col("o_orderstatus") == s
        aggs.append(F.count(F.when(hit, 1)).alias(f"n_{s.lower()}"))
        aggs.append(
            dsum(F.when(hit, F.col("o_totalprice")).otherwise(0.0)).alias(
                f"rev_{s.lower()}"
            )
        )
    return o.groupBy("o_orderpriority").agg(*aggs)


@register(
    "q_unpivot_status",
    oracle=f"""
        WITH wide AS (
            SELECT o_orderpriority,
                   {", ".join(
                       f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s.lower()}"
                       for s in _STATUSES)}
            FROM orders GROUP BY o_orderpriority
        )
        {" UNION ALL ".join(
            f"SELECT o_orderpriority, '{s.lower()}' AS status, n_{s.lower()} AS n FROM wide"
            for s in _STATUSES)}
    """,
    doc="Unpivot the wide status counts back to long (priority, status, n) "
        "triples — Spark's native unpivot/melt, a zero-shuffle Expand.",
)
def q_unpivot_status(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        *[
            F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
            for s in _STATUSES
        ]
    )
    return wide.unpivot(
        ["o_orderpriority"],
        [f"n_{s.lower()}" for s in _STATUSES],
        "status",
        "n",
    ).withColumn("status", F.expr("substring(status, 3)"))


@register(
    "q_sample_hash",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                            || CAST(l_linenumber AS VARCHAR)), 1, 1) = 'a'
    """,
    doc="Deterministic ~1/16 sample keyed on content hash (md5 of the "
        "unique key), not rand(): the same rows are sampled on any engine, "
        "partitioning, or rerun — reproducible train/held-out splits at "
        "100 TB. The predicate is a cheap scan-side filter.",
)
def q_sample_hash(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return li.filter(F.substring(F.md5(key), 1, 1) == "a").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_events_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS first_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        conv AS (
            SELECT DISTINCT v.user_id
            FROM v JOIN events e
              ON e.user_id = v.user_id
             AND e.event_type = 'purchase'
             AND e.ts >= v.first_view
             AND e.ts < v.first_view + INTERVAL 1 HOUR
        )
        SELECT (SELECT count(*) FROM v) AS n_view_users,
               (SELECT count(*) FROM conv) AS n_converted,
               round((SELECT count(*) FROM conv)
                     / CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS conv_rate
    """,
    doc="Two-stage funnel over the event stream: users whose first 'view' "
        "is followed by a 'purchase' within one hour. Per-user min(ts) "
        "reduces map-side before the range self-join; the conversion join "
        "is left-semi so each user counts once.",
)
def q_events_funnel(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = v.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("first_view"))
        & (F.col("p_ts") < F.col("first_view") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    counts = v.agg(F.count(F.lit(1)).alias("n_view_users")).crossJoin(
        conv.agg(F.count(F.lit(1)).alias("n_converted"))
    )
    return counts.select(
        "n_view_users",
        "n_converted",
        r6(F.col("n_converted") / F.col("n_view_users").cast("double")).alias(
            "conv_rate"
        ),
    )


@register(
    "q_events_retention",
    oracle="""
        WITH cohort AS (
            SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT c.cohort_day,
               date_diff('day', c.cohort_day,
                         CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN cohort c ON e.user_id = c.user_id
        WHERE date_diff('day', c.cohort_day,
                        CAST(date_trunc('day', e.ts) AS DATE)) <= 7
        GROUP BY 1, 2
    """,
    doc="Cohort retention: cohort = each user's first active day; count "
        "distinct users active at day offsets 0..7. The cohort table is a "
        "per-user aggregate (|users|, not |events| — smaller but unbounded, "
        "so no forced broadcast; AQE broadcasts at test SFs, shuffle-joins "
        "at scale); one shuffle for the final distinct-count.",
)
def q_events_retention(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("cohort_day")
    )
    joined = ev.join(cohort, "user_id").select(
        "cohort_day",
        F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("cohort_day")).alias(
            "day_offset"
        ),
        "user_id",
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_PROFILE_COLS = ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


@register(
    "q_profile_stats",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM customer
        """
        for c in _PROFILE_COLS
    ),
    origin="CORE",
    doc="Column profiler — the data-quality report an ETL toolchain runs "
        "before wiring a source: per-column row/null/distinct counts over "
        "customer, one output row per column. Spark side is a SINGLE scan: "
        "all per-column aggregates (count_distinct expands via Expand, "
        "null counts ride along) computed in one pass, then the 1-row-per-"
        "column shape is produced by exploding the one aggregate row — "
        "never N scans of a 100 TB table. The oracle's UNION ALL of "
        "per-column scans is the semantic spec, not the plan.",
)
def q_profile_stats(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    aggs = []
    for col in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{col}__rows"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.countDistinct(col).alias(f"{col}__distinct"),
        ]
    one = c.agg(*aggs)
    profile_rows = F.array(*[
        F.struct(
            F.lit(col).alias("col_name"),
            F.col(f"{col}__rows").alias("n_rows"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
        )
        for col in _PROFILE_COLS
    ])
    return one.select(F.explode(profile_rows).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


@register(
    "q_events_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    origin="CORE",
    doc="Behavioral transition matrix (first-order Markov counts): for "
        "each user's event sequence ordered by (ts, event_id), count "
        "(prev_type → next_type) transitions — the input to funnel "
        "discovery and next-action models. One user_id window shuffle to "
        "form pairs, then a map-side-combined count over "
        "|event_types|^2 keys; output is tiny at any corpus size.",
)
def q_events_transitions(spark, sf_dir):
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_dq_checks",
    oracle="""
        SELECT 'lineitem_orphans' AS check_name,
               CAST(count(*) AS BIGINT) AS n_violations
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 100
        UNION ALL
        SELECT 'orders_dup_keys', CAST(count(*) AS BIGINT)
        FROM (SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)
        UNION ALL
        SELECT 'orders_null_date', CAST(count(*) AS BIGINT)
        FROM orders WHERE o_orderdate IS NULL
        UNION ALL
        SELECT 'orders_bad_status', CAST(count(*) AS BIGINT)
        FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P')
    """,
    origin="CORE",
    doc="Data-quality constraint audit (the dbt-test / deequ-style gate an "
        "ETL pipeline runs before publishing): referential orphans "
        "(left-anti join), range violations, duplicate keys, null and "
        "domain violations — one (check_name, n_violations) row each. "
        "Spark side scans each table ONCE per role: the three orders "
        "checks ride a single aggregate over one scan; the orphan check "
        "is one anti join (broadcast-able key set); never a scan per "
        "check. The oracle's per-check UNION ALL is the semantic spec, "
        "not the plan.",
)
def q_dq_checks(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"),
              li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitem_orphans").alias("check_name"),
                F.col("n").alias("n_violations"))
    )
    qty_range = (
        li.agg(
            F.count(
                F.when((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100), 1)
            ).alias("n")
        )
        .select(F.lit("lineitem_qty_range").alias("check_name"),
                F.col("n").alias("n_violations"))
    )
    dup_keys = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orders_dup_keys").alias("check_name"),
                F.col("n").alias("n_violations"))
    )
    # null-date and domain checks share one scan/aggregate over orders
    scalar_checks = (
        o.agg(
            F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_date"),
            F.count(
                F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
            ).alias("bad_status"),
        )
        .select(
            F.explode(
                F.create_map(
                    F.lit("orders_null_date"), F.col("null_date"),
                    F.lit("orders_bad_status"), F.col("bad_status"),
                )
            ).alias("check_name", "n_violations")
        )
    )
    return orphans.unionAll(qty_range).unionAll(dup_keys).unionAll(scalar_checks)


_CONC_HOLD = "INTERVAL 5 MINUTES"  # how long one event occupies a slot


@register(
    "q_events_concurrency",
    oracle="""
        WITH pts AS (
            SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
            UNION ALL
            SELECT event_type, ts + INTERVAL 5 MINUTE, -1, event_id
            FROM events
        ), run AS (
            SELECT event_type,
                   SUM(delta) OVER (PARTITION BY event_type
                       ORDER BY t, delta, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS running
            FROM pts
        )
        SELECT event_type, CAST(max(running) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY event_type
    """,
    origin="CORE",
    doc="Peak-concurrency interval analytics (max simultaneous 5-minute "
        "event holds per type) via the +1/-1 boundary sweep: every "
        "interval contributes a start and an end point, a running sum "
        "over the (t, delta, event_id) total order counts live intervals, "
        "the max is the peak. delta sorts ends (-1) before starts (+1) at "
        "the same instant — half-open [t, t+5m) semantics at boundaries. "
        "One window shuffle on event_type; 2x|events| points. The "
        "gaps-and-islands sibling of q_stream_session.",
)
def q_events_concurrency(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        "event_type",
        F.expr(f"ts + {_CONC_HOLD}").alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionAll(ends).select(
        "event_type", F.sum("delta").over(w).alias("running")
    )
    return run.groupBy("event_type").agg(
        F.max("running").cast("long").alias("peak_concurrency")
    )


@register(
    "q_sample_weighted",
    oracle="""
        SELECT doc_id, n_chars,
               round(least(1.0, n_chars / 400.0), 6) AS p_include
        FROM documents
        WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)
                                              || ':' || text), 1, 15))
                   AS BIGINT) / 1152921504606846976.0
              < least(1.0, n_chars / 400.0)
    """,
    origin="LLM",
    doc="Weighted deterministic sampling (quality-proportional corpus "
        "downsampling): each document is kept with probability "
        "p = min(1, n_chars/400), decided by comparing a portable 60-bit "
        "content hash mapped to [0,1) against p — never rand(), so the "
        "SAME documents are chosen on any engine, partitioning, executor "
        "count, or rerun (reproducible data recipes at 100 TB). "
        "Zero-shuffle scan-side predicate; the hash uniform and the "
        "weight are both exact-arithmetic identical across engines.",
)
def q_sample_weighted(spark, sf_dir):
    from xml_processor_spark.functions.deterministic import phash60

    d = table(spark, sf_dir, "documents")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    u = phash60(key).cast("double") / float(1 << 60)
    p = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    return d.filter(u < p).select(
        "doc_id", "n_chars", F.round(p, 6).alias("p_include")
    )


@register(
    "q_domain_stats",
    oracle="""
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               round(avg(n_chars), 6) AS avg_chars,
               max(n_chars) AS max_chars,
               round(avg(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END), 6)
                   AS short_frac
        FROM documents
        GROUP BY source, lang
    """,
    origin="LLM",
    doc="Per-(source, language) corpus profile: doc/token volume, mean and "
        "max length, short-doc fraction — the curation dashboard that "
        "decides per-domain mixture weights and which sources need "
        "filtering. One map-side-combined groupBy; every aggregate is an "
        "exact integer (or 0/1) sum below 2^53, so the 6-dp rounding is "
        "order-independent by construction.",
)
def q_domain_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
            r6(F.avg("n_chars")).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
            r6(
                F.avg((F.col("n_chars") < 100).cast("double"))
            ).alias("short_frac"),
        )
    )


@register(
    "q_events_rolling_active",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                            user_id
            FROM events
        ), spine AS (SELECT DISTINCT d FROM daily)
        SELECT s.d,
               CAST(count(DISTINCT CASE WHEN a.d = s.d THEN a.user_id END)
                    AS BIGINT) AS dau,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau7
        FROM spine s JOIN daily a
          ON a.d BETWEEN s.d - INTERVAL 6 DAY AND s.d
        GROUP BY s.d
    """,
    doc="Rolling active users — DAU and trailing-7-day WAU per day. "
        "Distinct-over-a-sliding-window has no window-function form, so "
        "the scale shape is: dedup events to (day, user) FIRST (the big "
        "map-side-combined reduction — |days|x|users| rows out of "
        "|events|), then EXPLODE each (day, user) row into the <= 7 spine "
        "days it covers (F.sequence(d, d+6)) and equi-join that against "
        "the calendar-bounded day spine — a BroadcastHashJoin on the day "
        "key, never a nested-loop/range join (ADVICE r6: the BETWEEN form "
        "planned as a |days|x|daily| BroadcastNestedLoopJoin). "
        "Amplification is exactly 7x|daily| rows by construction; the "
        "spine broadcast is bounded by calendar days, not data volume.",
)
def q_events_rolling_active(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    spine = daily.select(F.col("d").alias("sd")).distinct()
    fanned = daily.select(
        "d",
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("sd"),
    )
    joined = fanned.join(F.broadcast(spine), "sd")
    return (
        joined.groupBy(F.col("sd").alias("d"))
        .agg(
            F.count_distinct(
                F.when(F.col("d") == F.col("sd"), F.col("user_id"))
            ).alias("dau"),
            F.count_distinct("user_id").alias("wau7"),
        )
    )


@register(
    "q_events_funnel_ordered",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
               (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_view_click,
               (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_view_click_purchase
    """,
    doc="Strictly-ordered 3-step funnel (view -> click -> purchase, each "
        "step after the previous step's FIRST occurrence): per-user "
        "min-ts chaining — stage k is a per-user aggregate joined back "
        "to the event stream with a ts > prior-stage filter, so each "
        "stage is one key-partitioned join + map-side-combined min, and "
        "all stages share the user_id partitioning (no broadcast "
        "assumption: stage survivor sets are user-dimension-sized). The "
        "window-free formulation is the one that scales — a per-user "
        "sort + sessionize would work but shuffles full event payloads.",
)
def q_events_funnel_ordered(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (the classic warehouse scoring query).
# ---------------------------------------------------------------------------


@register(
    "q_orders_rfm",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey,
                   date_diff('day', max(o_orderdate),
                             (SELECT max(o_orderdate) FROM orders))
                       AS recency_days,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey
        ), seg AS (
            SELECT r.*, c.c_mktsegment
            FROM rfm r JOIN customer c ON c.c_custkey = r.o_custkey
        )
        SELECT o_custkey, c_mktsegment, recency_days, n_orders,
               monetary_cents,
               CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                    ORDER BY recency_days, o_custkey) AS BIGINT) AS r_score,
               CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                    ORDER BY n_orders DESC, o_custkey) AS BIGINT) AS f_score,
               CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                    ORDER BY monetary_cents DESC, o_custkey) AS BIGINT)
                   AS m_score
        FROM seg
    """,
    doc="RFM customer segmentation — the classic warehouse scoring query: "
        "per customer, recency (days since last order vs the corpus max "
        "date), frequency (order count), monetary (exact integer-cents "
        "lifetime total), each quartile-scored 1-4 WITHIN the customer's "
        "market segment (segment-relative scoring — and the per-stratum "
        "window discipline: all three ntiles share ONE c_mktsegment hash "
        "partitioning, never a global sort over |customers|). Unique "
        "(metric, custkey) tie-breaks make every score deterministic on "
        "any engine/partitioning; the global max date is a 1-row "
        "broadcast scalar. The orders->customer join is key-partitioned "
        "with no broadcast assumption (both are fact-sized at 100 TB).",
)
def q_orders_rfm(spark, sf_dir):
    from pyspark.sql import Window

    from xml_processor_spark.functions.deterministic import cents

    o = table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_date", "last_order").cast("long").alias(
                "recency_days"
            ),
            "n_orders",
            "monetary_cents",
        )
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    seg = rfm.join(c, "o_custkey")
    by_seg = Window.partitionBy("c_mktsegment")
    r_w = by_seg.orderBy("recency_days", "o_custkey")
    f_w = by_seg.orderBy(F.desc("n_orders"), F.col("o_custkey"))
    m_w = by_seg.orderBy(F.desc("monetary_cents"), F.col("o_custkey"))
    return seg.select(
        "o_custkey",
        "c_mktsegment",
        "recency_days",
        "n_orders",
        "monetary_cents",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — dominance analysis per group.
# ---------------------------------------------------------------------------


@register(
    "q_part_skyline",
    oracle="""
        WITH p AS (
            SELECT p_brand, p_partkey, p_size,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
            FROM part
        )
        SELECT a.p_brand, a.p_partkey, a.p_size, a.price_c
        FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.p_brand = a.p_brand
              AND b.price_c <= a.price_c AND b.p_size >= a.p_size
              AND (b.price_c < a.price_c OR b.p_size > a.p_size)
        )
    """,
    doc="Skyline / Pareto-frontier operator: per brand, the parts not "
        "dominated by any other part on (cheaper-or-equal price, larger-"
        "or-equal size, strictly better in one). The oracle states the "
        "O(n^2) NOT-EXISTS dominance definition; the Spark plan re-"
        "expresses it as two windows sharing ONE p_brand hash partition: "
        "a RANGE frame (max size over all STRICTLY cheaper rows) and a "
        "per-(brand, price) max — a row survives iff it beats the first "
        "and equals the second. O(n log n) per brand, no self-join, no "
        "pairwise compare; at 100 TB the shuffle is one repartition on "
        "brand and the frontier math is a sort within partition. Price "
        "compares in integer cents (float <= is representation-"
        "dependent); identical (price, size) twins both survive, per the "
        "strict-dominance definition, in both formulations.",
)
def q_part_skyline(spark, sf_dir):
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_size", cents("p_retailprice").alias("price_c")
    )
    cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_price = Window.partitionBy("p_brand", "price_c")
    return (
        p.withColumn("max_cheaper", F.max("p_size").over(cheaper))
        .withColumn("max_same", F.max("p_size").over(same_price))
        .filter(
            (F.col("max_cheaper").isNull()
             | (F.col("p_size") > F.col("max_cheaper")))
            & (F.col("p_size") == F.col("max_same"))
        )
        .select("p_brand", "p_partkey", "p_size", "price_c")
    )


# ---------------------------------------------------------------------------
# Cohort revenue matrix (acquisition-month x months-since).
# ---------------------------------------------------------------------------


@register(
    "q_orders_cohort",
    oracle="""
        WITH m AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                        AS BIGINT) AS ym,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), firsts AS (
            SELECT o_custkey, min(ym) AS cohort_ym FROM m GROUP BY o_custkey
        )
        SELECT CAST(cohort_ym // 12 AS BIGINT) AS cohort_year,
               CAST(cohort_ym % 12 + 1 AS BIGINT) AS cohort_month,
               CAST(m.ym - cohort_ym AS BIGINT) AS months_since,
               CAST(count(DISTINCT m.o_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(cents) AS revenue_cents
        FROM m JOIN firsts ON m.o_custkey = firsts.o_custkey
        GROUP BY cohort_ym, months_since
    """,
    doc="Cohort revenue matrix — the canonical retention/LTV rollup: each "
        "customer is assigned to the month of their first order, then "
        "(cohort month x months-since-acquisition) cells accumulate "
        "distinct customers, orders, and exact-cents revenue. Month "
        "arithmetic is pure integers (y*12+m), immune to engine interval "
        "semantics. Scale shape: the min-month groupBy and the join back "
        "both hash on o_custkey — one key partitioning reused across "
        "both stages (no second shuffle of the fact side under AQE "
        "exchange reuse), then a tiny (months x months) final aggregate. "
        "No window over the fact table, no broadcast assumption on "
        "either side.",
)
def q_orders_cohort(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("ym"),
        cents("o_totalprice").alias("cents"),
    )
    firsts = m.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    return (
        m.join(firsts, "o_custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("months_since"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            F.floor(F.col("cohort_ym") / 12).cast("long").alias("cohort_year"),
            (F.col("cohort_ym") % 12 + 1).cast("long").alias("cohort_month"),
            F.col("months_since").cast("long"),
            "n_customers",
            "n_orders",
            "revenue_cents",
        )
    )


# ---------------------------------------------------------------------------
# Batch sessionization (gap-based) and per-type anomaly scan.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, in micros


@register(
    "q_events_sessionize",
    oracle=f"""
        WITH t AS (
            SELECT user_id, event_id, event_type, ts,
                   epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        ), s AS (
            SELECT user_id, event_id, event_type, ts, us,
                   CAST(sum(CASE WHEN prev_us IS NULL
                                 OR us - prev_us > {_SESSION_GAP_US}
                                 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM t
        )
        SELECT user_id, session_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST((max(us) - min(us)) // 1000000 AS BIGINT)
                   AS duration_sec
        FROM s
        GROUP BY user_id, session_idx
    """,
    doc="Batch gap-based sessionization — the classic clickstream "
        "operator (the batch twin of the streaming session window "
        "q_stream_session): a new session starts after a 30-minute "
        "inactivity gap; per session, event count, distinct types, "
        "start/end, and duration. Gap and duration arithmetic is exact "
        "integer MICROSECONDS (epoch_us/unix_micros — no engine "
        "interval or truncation semantics involved), the event order is "
        "total ((ts, event_id) tie-break). Scale shape: the lag window, "
        "the session-id running sum, and the final groupBy all share "
        "ONE user_id hash partitioning — one shuffle of the fact table, "
        "then per-user sorted passes; no self-join, no driver state.",
)
def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts",
        F.unix_micros("ts").alias("us"),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("us").over(order)
    is_new = (
        prev.isNull() | ((F.col("us") - prev) > _SESSION_GAP_US)
    ).cast("long")
    sid = F.sum(is_new).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("session_idx", sid)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.floor((F.max("us") - F.min("us")) / 1_000_000)
            .cast("long")
            .alias("duration_sec"),
        )
    )


@register(
    "q_events_anomaly",
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS vc
            FROM events WHERE value IS NOT NULL
        ), stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(vc) AS s, sum(vc * vc) AS ss
            FROM v GROUP BY event_type
        )
        SELECT v.event_type, n,
               round(CAST(s AS DOUBLE) * 1e4 / n) / 1e6 AS mean_value,
               round(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (n - 1))) * 1e4) / 1e6
                   AS std_value,
               CAST(count(*) FILTER (
                   abs(CAST(n AS DOUBLE) * vc - CAST(s AS DOUBLE))
                   > 3.0 * CAST(n AS DOUBLE)
                       * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                              / (CAST(n AS DOUBLE) * (n - 1)))
               ) AS BIGINT) AS n_outliers,
               round(max(abs(CAST(n AS DOUBLE) * vc - CAST(s AS DOUBLE)))
                     / (CAST(n AS DOUBLE)
                        * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                               / (CAST(n AS DOUBLE) * (n - 1)))), 6)
                   AS max_abs_z
        FROM v JOIN stats ON v.event_type = stats.event_type
        GROUP BY v.event_type, n, s, ss
    """,
    doc="Per-type z-score anomaly scan — the distribution-drift check a "
        "pipeline runs on every metric column: per event_type, mean/std from "
        "EXACT integer-cent sums, the 3-sigma outlier count, and the "
        "max |z|. The z comparison is the exact-integer inequality "
        "|n*v - S| > 3*n*std (no per-row float mean subtraction): both "
        "engines derive identical doubles from identical BIGINTs, so "
        "the flags match bit-for-bit. Two map-side-combined passes "
        "(stats, then flag+count) joined on the low-cardinality type "
        "key — no hint; the stats side is |types| rows and AQE "
        "broadcasts it at any scale. 6-dp moments round in integer "
        "space (the emb-moments tie lesson).",
)
def q_events_anomaly(spark, sf_dir):
    from xml_processor_spark.functions.deterministic import cents

    v = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", cents("value").alias("vc"))
    )
    stats = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("ss"),
    )
    j = v.join(stats, "event_type")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    std_c = F.sqrt((nd * ssd - sd * sd) / (nd * (F.col("n") - 1)))
    dev = F.abs(nd * F.col("vc") - sd)
    return (
        j.groupBy("event_type", "n", "s", "ss")
        .agg(
            F.sum((dev > 3.0 * nd * std_c).cast("long")).alias("n_outliers"),
            F.max(dev).alias("max_dev"),
        )
        .select(
            "event_type",
            "n",
            (F.round(sd * 1e4 / nd) / 1e6).alias("mean_value"),
            (F.round(std_c * 1e4) / 1e6).alias("std_value"),
            "n_outliers",
            F.round(F.col("max_dev") / (nd * std_c), 6).alias("max_abs_z"),
        )
    )


# Referential-integrity edges: (edge label, child table, fk col, parent
# table, pk col). A real warehouse runs this audit on every load.
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
)


@register(
    "q_fk_orphans",
    oracle="\n        UNION ALL\n".join(
        f"""
        SELECT '{label}' AS edge,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (p.{pk} IS NULL) AS BIGINT) AS n_orphans,
               round(CAST(count(*) FILTER (p.{pk} IS NULL) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS orphan_rate
        FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
        """
        for label, child, fk, parent, pk in _FK_EDGES
    ),
    origin="CORE",
    doc="Referential-integrity audit across every FK edge of the schema: "
        "child row count, orphan count (FK with no parent), orphan rate "
        "— the post-load gate that catches partial ingests and broken "
        "partitions before queries silently drop rows in inner joins. "
        "One row per edge. Scale shape: each edge is ONE key-partitioned "
        "left join (parent PKs are unique — no fan-out) + a 1-row "
        "count; small parents (nation) broadcast under AQE, fact-sized "
        "parents co-partition; edges are independent so the union "
        "parallelizes across the cluster.",
)
def q_fk_orphans(spark, sf_dir):
    out = None
    for label, child, fk, parent, pk in _FK_EDGES:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(pk)
        joined = c.select(fk).join(p, c[fk] == p[pk], "left")
        # Per-edge agg/select as JVM-parsed strings (guide §5): the
        # Column-API loop cost ~1,800 py4j round-trips over the edges.
        row = joined.agg(
            F.expr("count(1) AS n_rows"),
            F.expr(
                f"count(CASE WHEN {pk} IS NULL THEN 1 END) AS n_orphans"
            ),
        ).selectExpr(
            f"'{label}' AS edge",
            "n_rows", "n_orphans",
            "round(CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)"
            " AS orphan_rate",
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "q_events_paths",
    oracle=f"""
        WITH t AS (
            SELECT user_id, event_id, event_type, ts,
                   epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        ), s AS (
            SELECT user_id, event_id, event_type, ts, us,
                   CAST(sum(CASE WHEN prev_us IS NULL
                                 OR us - prev_us > {_SESSION_GAP_US}
                                 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM t
        ), tri AS (
            SELECT event_type AS step1,
                   lead(event_type, 1) OVER w AS step2,
                   lead(event_type, 2) OVER w AS step3,
                   session_idx,
                   lead(session_idx, 1) OVER w AS k2,
                   lead(session_idx, 2) OVER w AS k3
            FROM s
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), paths AS (
            SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
            FROM tri
            WHERE k2 = session_idx AND k3 = session_idx
            GROUP BY 1, 2, 3
        ), tot AS (
            SELECT CAST(sum(n_paths) AS BIGINT) AS nt FROM paths
        )
        SELECT step1, step2, step3, n_paths,
               round(CAST(n_paths AS DOUBLE) / CAST(tot.nt AS DOUBLE), 6)
                   AS share
        FROM paths CROSS JOIN tot
    """,
    doc="Session path mining — the funnel-DISCOVERY operator (the "
        "declared funnels in q_events_funnel/funnel_ordered check known "
        "paths; this one finds them): every within-session 3-step "
        "event-type path with its corpus-wide count and share. Sessions "
        "are the SAME 30-minute-gap rule as q_events_sessionize "
        "(textually shared CTE prefix); steps are consecutive events "
        "under the total (ts, event_id) order, and a trigram counts only "
        "when all three events share a session (lead-of-session-idx "
        "equality — no cross-session stitching). Output is bounded by "
        "|types|³ at ANY corpus size. Scale shape: the lag/lead windows, "
        "the session running sum, and the trigram projection all ride "
        "ONE user_id hash partitioning — one fact shuffle, then a "
        "map-side-combined count to the bounded path table and a 1-row "
        "total broadcast.",
)
def q_events_paths(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w_u)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > _SESSION_GAP_US), 1
    ).otherwise(0)
    s = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.sum(new_sess)
        .over(w_u.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_idx"),
    )
    tri = s.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w_u).alias("step2"),
        F.lead("event_type", 2).over(w_u).alias("step3"),
        "session_idx",
        F.lead("session_idx", 1).over(w_u).alias("k2"),
        F.lead("session_idx", 2).over(w_u).alias("k3"),
    )
    paths = (
        tri.filter(
            (F.col("k2") == F.col("session_idx"))
            & (F.col("k3") == F.col("session_idx"))
        )
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    tot = paths.agg(F.sum("n_paths").cast("long").alias("nt"))
    return paths.crossJoin(F.broadcast(tot)).select(
        "step1", "step2", "step3", "n_paths",
        r6(
            F.col("n_paths").cast("double") / F.col("nt").cast("double")
        ).alias("share"),
    )


@register(
    "q_cust_seg_migration",
    oracle="""
        WITH bounds AS (
            SELECT min(o_orderdate) AS mn,
                   CAST(date_diff('day', min(o_orderdate),
                                  max(o_orderdate)) AS BIGINT) AS dd
            FROM orders
        ), halves AS (
            SELECT o_custkey,
                   CASE WHEN 2 * CAST(date_diff('day', b.mn, o_orderdate)
                                 AS BIGINT) <= b.dd
                        THEN 1 ELSE 2 END AS half,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders CROSS JOIN bounds b
        ), spend AS (
            SELECT o_custkey, half,
                   CAST(sum(cents) AS BIGINT) AS spend_cents
            FROM halves GROUP BY 1, 2
        ), terc AS (
            SELECT o_custkey, half,
                   CAST(ntile(3) OVER (PARTITION BY half
                        ORDER BY spend_cents DESC, o_custkey) AS BIGINT)
                       AS t
            FROM spend
        ), wide AS (
            SELECT o_custkey,
                   max(CASE WHEN half = 1 THEN t END) AS t1,
                   max(CASE WHEN half = 2 THEN t END) AS t2
            FROM terc GROUP BY o_custkey
        )
        SELECT coalesce('T' || CAST(t1 AS VARCHAR), 'absent') AS seg_h1,
               coalesce('T' || CAST(t2 AS VARCHAR), 'absent') AS seg_h2,
               CAST(count(*) AS BIGINT) AS n_cust
        FROM wide
        GROUP BY 1, 2
    """,
    doc="Customer-segment migration matrix — the retention question RFM "
        "snapshots can't answer: split the corpus at its order-date "
        "midpoint (integer day arithmetic against a 1-row bounds "
        "broadcast — no engine date-add semantics involved), tercile "
        "customers by exact-cents spend WITHIN each half (spend DESC, "
        "custkey tie-break — the q_orders_rfm per-stratum window "
        "discipline), then count every (H1 tercile → H2 tercile) "
        "transition, with 'absent' rows capturing acquisition (new in "
        "H2) and churn (gone in H2). Output bounded by 4x4 states at "
        "any corpus size. Scale shape: one orders scan → keyed "
        "(custkey, half) aggregate; the two ntiles share ONE half-keyed "
        "partitioning; the halves pivot is a conditional-aggregation "
        "pass over the per-(customer, half) table (the q_pivot_status "
        "shape — no self-join, the fact pipeline derives once); the "
        "matrix is a map-side-combined count.",
)
def q_cust_seg_migration(spark, sf_dir):
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("mn"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("long")
        .alias("dd"),
    )
    halves = o.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        F.when(
            2 * F.datediff("o_orderdate", "mn").cast("long") <= F.col("dd"), 1
        )
        .otherwise(2)
        .alias("half"),
        cents("o_totalprice").alias("c"),
    )
    spend = halves.groupBy("o_custkey", "half").agg(
        F.sum("c").cast("long").alias("spend_cents")
    )
    w = Window.partitionBy("half").orderBy(
        F.col("spend_cents").desc(), "o_custkey"
    )
    terc = spend.select(
        "o_custkey", "half", F.ntile(3).over(w).cast("long").alias("t")
    )
    # Conditional-aggregation pivot (the q_pivot_status shape): one pass
    # over the bounded per-(customer, half) table — no full-outer
    # self-join, so the orders pipeline underneath derives ONCE.
    wide = terc.groupBy("o_custkey").agg(
        F.max(F.when(F.col("half") == 1, F.col("t"))).alias("t1"),
        F.max(F.when(F.col("half") == 2, F.col("t"))).alias("t2"),
    )
    seg = lambda t: F.coalesce(  # noqa: E731
        F.concat(F.lit("T"), t.cast("string")), F.lit("absent")
    )
    return wide.groupBy(
        seg(F.col("t1")).alias("seg_h1"), seg(F.col("t2")).alias("seg_h2")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
