"""Physical-design & drift audits (SURVEY §2.L/M extensions).

The queries an engineering team runs BEFORE committing a 100 TB layout or
merging a new data drop:

- `q_partition_skew` measures, in one fact pass, how three candidate
  partition layouts would balance — the empirical input to every
  `partitionBy`/bucketing decision in this repo's scale notes.
- `q_events_burstiness` quantifies overdispersion of the daily event feed
  (Fano factor + Goh–Barabási burstiness), the statistic that decides
  whether a feed needs salting/AQE-skew handling at all.
- `q_docs_length_drift` chi-squares each source's document-length
  histogram against the pooled corpus — the cheap structural drift gate
  that runs before any content-level (embedding) check.

House rules as everywhere: aggregate-first onto calendar/bucket-bounded
cells, exact-integer internals, floats only in final closed forms at 6 dp
over identical cross-engine expression trees.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.io import register_views, table
from xml_processor_spark.registry import register

_D38 = "decimal(38,0)"

# Candidate layouts audited by q_partition_skew. 512 hash buckets is the
# bucketed-join layout of q_join_bucketed scaled down; day/month are the
# natural time-partitionings of a shipment fact.
_SKEW_BUCKETS = 512


def _skew_sql(intdiv: str) -> str:
    """Dialect-shared skew-audit SQL; `intdiv` is 'DIV' (Spark) / '//'
    (DuckDB) — the only token the two dialects disagree on."""
    return f"""
        WITH keyed AS (
            SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
                   CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
                   l_orderkey % {_SKEW_BUCKETS} AS b
            FROM lineitem
        ), parts AS (
            SELECT CASE WHEN GROUPING(d) = 0 THEN 'ship_day'
                        WHEN GROUPING(m) = 0 THEN 'ship_month'
                        ELSE 'okey_bucket{_SKEW_BUCKETS}' END AS layout,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM keyed
            GROUP BY GROUPING SETS ((d), (m), (b))
        ), r AS (
            SELECT layout, cnt,
                   row_number() OVER (PARTITION BY layout
                                      ORDER BY cnt) AS rn,
                   count(*) OVER (PARTITION BY layout) AS np
            FROM parts
        )
        SELECT layout,
               CAST(max(np) AS BIGINT) AS n_parts,
               CAST(min(cnt) AS BIGINT) AS rows_min,
               CAST(avg(CASE WHEN rn = (np + 1) {intdiv} 2
                              OR rn = (np + 2) {intdiv} 2
                             THEN CAST(cnt AS DOUBLE) END) AS DOUBLE)
                   AS rows_p50,
               CAST(max(cnt) AS BIGINT) AS rows_max,
               round(CAST(max(cnt) AS DOUBLE)
                     / avg(CASE WHEN rn = (np + 1) {intdiv} 2
                                 OR rn = (np + 2) {intdiv} 2
                                THEN CAST(cnt AS DOUBLE) END), 6)
                   AS skew_max_over_p50
        FROM r
        GROUP BY layout
    """


@register(
    "q_partition_skew",
    oracle=_skew_sql("//"),
    doc="Partition-layout skew advisor: ONE fact pass sizes every "
        "partition of three candidate layouts simultaneously — ship day, "
        f"ship month, and orderkey % {_SKEW_BUCKETS} hash buckets — via "
        "GROUPING SETS (a single Expand + one map-side-combined "
        "aggregate, NOT three scans), then reports per layout the "
        "partition count, min/median/max rows and max/p50 skew ratio. "
        "This is the measurement that justifies this repo's own layout "
        "choices: a skew ratio near 1 means even task sizes; day "
        "partitions of a growing business are right-skewed (recent days "
        "are bigger); hash buckets are flat by construction. Median is "
        "POSITIONAL (row_number over the bounded partition table, both "
        "middles averaged — the q_nation_theilsen discipline), never a "
        "float quantile estimate. Scale shape: the Expand multiplies the "
        "scan ×3 but collapses map-side into ≤|days|+|months|+"
        f"{_SKEW_BUCKETS} cells; ranking windows run over that bounded "
        "table, keyed per layout. Dialect-shared SQL text (the single "
        "DIV-vs-// token differs), so both engines execute the "
        "identical statement shape.",
)
def q_partition_skew(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_skew_sql("DIV"))


@register(
    "q_events_burstiness",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
                       AS syy
            FROM daily GROUP BY 1
        )
        SELECT event_type, n_days,
               round(CAST(sy AS DOUBLE) / n_days, 6) AS mean_daily,
               round(
                   ((CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_days)
                    / (n_days - 1.0))
                   / (CAST(sy AS DOUBLE) / n_days), 6) AS fano,
               round(
                   (sqrt((CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                            / n_days) / (n_days - 1.0))
                    - CAST(sy AS DOUBLE) / n_days)
                   / (sqrt((CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                              / n_days) / (n_days - 1.0))
                      + CAST(sy AS DOUBLE) / n_days), 6) AS burstiness
        FROM m
    """,
    doc="Overdispersion audit of the daily event feed, per type: Fano "
        "factor (var/mean — 1 for a Poisson-flat feed, >1 bursty) and "
        "the Goh–Barabási burstiness score (σ−μ)/(σ+μ) ∈ (−1, 1). THIS "
        "is the statistic that decides whether a feed needs salting or "
        "AQE skew handling: a Fano near 1 means hash-by-day tasks are "
        "even, a large Fano predicts straggler partitions. Moments are "
        "exact (Σy BIGINT, Σy² decimal(38,0) — y² reaches 4e15/day at "
        "1.5e11 events and the sum crosses int64 within a year); mean/"
        "var/σ combine in double over the identical tree, 6 dp. Scale "
        "shape: one map-side-combined (type, day) histogram off the "
        "fact scan, then a |types|-row moment rollup — no window, no "
        "join, nothing unbounded past the first shuffle.",
)
def q_events_burstiness(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y").cast(_D38) * F.col("y")).cast(_D38).alias("syy"),
    )
    nd = F.col("n_days")
    mean = F.col("sy").cast("double") / nd
    var = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / nd
    ) / (nd - 1.0)
    sd = F.sqrt(var)
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(var / mean, 6).alias("fano"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


_LEN_BIN_W = 100
_LEN_BIN_MAX = 20


@register(
    "q_docs_length_drift",
    oracle=f"""
        WITH b AS (
            SELECT source,
                   least(n_chars // {_LEN_BIN_W}, {_LEN_BIN_MAX}) AS bin
            FROM documents
        ), grid AS (
            SELECT source, bin, CAST(count(*) AS BIGINT) AS o
            FROM b GROUP BY 1, 2
        ), pooled AS (
            SELECT bin, CAST(sum(o) AS BIGINT) AS p FROM grid GROUP BY 1
        ), srcn AS (
            SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM grid GROUP BY 1
        ), tot AS (SELECT CAST(sum(p) AS BIGINT) AS nt FROM pooled),
        terms AS (
            SELECT g.source,
                   CAST(round(
                       (CAST(g.o AS DOUBLE) * nt - CAST(p AS DOUBLE) * ns)
                       * (CAST(g.o AS DOUBLE) * nt - CAST(p AS DOUBLE) * ns)
                       / (CAST(p AS DOUBLE) * ns * nt) * 1000000.0
                   ) AS BIGINT) AS t6
            FROM grid g JOIN pooled USING (bin)
                        JOIN srcn USING (source), tot
        )
        SELECT t.source, s.ns AS n_docs,
               round(CAST(sum(t.t6) AS DOUBLE) / 1000000.0, 6) AS chi2
        FROM terms t JOIN srcn s ON t.source = s.source
        GROUP BY 1, 2
    """,
    origin="LLM",
    doc="Per-source document-length drift gate: Pearson chi-squared of "
        f"each source's length histogram ({_LEN_BIN_W}-char bins, capped "
        f"at {_LEN_BIN_MAX + 1}) against the pooled corpus — the cheap "
        "structural check that catches a crawler regression (truncated "
        "pages, boilerplate explosions) before any content-level "
        "embedding diff runs. Expected counts use the pooled bin shares, "
        "so chi2 ≈ 0 means the source is length-representative. "
        "Determinism: per-bin terms are computed in double from EXACT "
        "integer counts via one identical expression, then fixed-pointed "
        "to 1e-6 (the declared resolution) so the per-source sum is an "
        "exact integer reduction — no partition-order float accumulation "
        "(the kmeans round(x·1e6) discipline). Scale shape: one "
        "map-side-combined (source, bin) grid off the corpus scan; "
        "pooled/source marginals and the term join are all bounded by "
        f"|sources|×{_LEN_BIN_MAX + 1} cells, broadcast-joined.",
)
def q_docs_length_drift(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    grid = (
        d.select(
            "source",
            F.least(
                F.floor(F.col("n_chars") / _LEN_BIN_W).cast("long"),
                F.lit(_LEN_BIN_MAX).cast("long"),
            ).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("o"))
        # ≤ |sources|×21 cells feed four branches: one corpus scan total.
        .localCheckpoint(eager=True)
    )
    pooled = grid.groupBy("bin").agg(F.sum("o").cast("long").alias("p"))
    srcn = grid.groupBy("source").agg(F.sum("o").cast("long").alias("ns"))
    tot = pooled.agg(F.sum("p").cast("long").alias("nt"))
    dev = (
        F.col("o").cast("double") * F.col("nt")
        - F.col("p").cast("double") * F.col("ns")
    )
    terms = (
        grid.join(F.broadcast(pooled), "bin")
        .join(F.broadcast(srcn), "source")
        .join(F.broadcast(tot))
        .select(
            "source",
            F.round(
                dev * dev
                / (F.col("p").cast("double") * F.col("ns") * F.col("nt"))
                * 1000000.0,
                0,
            ).cast("long").alias("t6"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("t6").alias("st6"))
        .join(F.broadcast(srcn), "source")
        .select(
            "source",
            F.col("ns").alias("n_docs"),
            F.round(F.col("st6").cast("double") / 1000000.0, 6).alias("chi2"),
        )
    )


@register(
    "q_events_bot_regularity",
    oracle="""
        WITH planted AS (
            -- Deterministic cadence plants (negated user ids can never
            -- collide with real users at any SF): users -1..-10 tick an
            -- exact 60 s metronome; -11..-20 alternate 40 s / 80 s
            -- (CV = 1/3 -> 'regular'). 20 events each.
            SELECT -(u.u) AS user_id,
                   CAST(1000000000000 AS BIGINT)
                   + CASE WHEN u.u <= 10 THEN i.i * 60000000
                          ELSE (i.i // 2) * 120000000
                               + (i.i % 2) * 40000000 END AS us,
                   CAST(u.u * 1000 + i.i AS BIGINT) AS event_id
            FROM (SELECT unnest(generate_series(1, 20)) AS u) u,
                 (SELECT unnest(generate_series(0, 19)) AS i) i
        ), stream AS (
            SELECT user_id, epoch_us(ts) AS us, event_id FROM events
            UNION ALL
            SELECT user_id, us, event_id FROM planted
        ), gaps AS (
            SELECT user_id,
                   us - lag(us) OVER (
                       PARTITION BY user_id ORDER BY us, event_id) AS g
            FROM stream
        ), m AS (
            SELECT user_id,
                   CAST(count(g) AS BIGINT) AS n,
                   CAST(sum(g) AS BIGINT) AS s1,
                   CAST(sum(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0))
                       AS s2
            FROM gaps WHERE g IS NOT NULL
            GROUP BY 1
            HAVING count(g) >= 5
        ), cls AS (
            SELECT user_id, n,
                   CASE WHEN 100 * (n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)
                             <= CAST(s1 AS DECIMAL(38,0)) * s1
                        THEN 'metronomic'
                        WHEN 4 * (n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)
                             <= CAST(s1 AS DECIMAL(38,0)) * s1
                        THEN 'regular'
                        ELSE 'organic' END AS cadence
            FROM m
        )
        SELECT cadence,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n) AS BIGINT) AS n_gaps,
               min(user_id) AS example_user
        FROM cls GROUP BY 1
    """,
    doc="Bot-cadence audit — the trust-and-safety screen: per user, the "
        "coefficient of variation of inter-event gaps (exact integer "
        "MICROSECONDS under a total order, users with ≥5 gaps); a human "
        "clickstream is bursty (CV ≳ 1), scripted traffic is metronomic "
        "(CV ≈ 0). Classes decide ENTIRELY in exact integer space via "
        "CV² cross-multiplication (100·(nS2−S1²) ≤ S1² ⇔ CV ≤ 0.1 "
        "'metronomic'; 4·… ⇔ CV ≤ 0.5 'regular'; else 'organic') — the "
        "q_brand_abc_xyz discipline, no float boundary can flip a user. "
        "Σg² rides decimal(38,0) (day-scale gaps are ~1e11 µs; squares "
        "cross int64 within a handful of gaps); if a product ever "
        "exceeds precision 38 the query RAISES (assert_true guard, "
        "ADVICE r9) instead of silently classifying 'organic' where "
        "DuckDB would error. The fixture has no "
        "scripted users, so the query PLANTS them deterministically "
        "(negated ids, exact 60 s metronome and 40/80 s alternation — "
        "CV 0 and 1/3 by construction), exercising all three classes "
        "in both engines. Scale shape: the lag window and the per-user "
        "moments share ONE user_id hash partitioning — one fact "
        "shuffle; the class census is a map-side-combined count onto "
        "≤3 rows; the plant is a 400-row bounded generator.",
)
def q_events_bot_regularity(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    # Deterministic cadence plants (negated ids — the E-EMB-LSH-HI
    # convention, collision-free at any SF): the synthetic fixture has
    # no scripted users, so without plants the two bot classes would be
    # dead branches. 20x20 bounded range cross join, pure integer math.
    u = spark.range(1, 21).select(F.col("id").alias("u"))
    i = spark.range(0, 20).select(F.col("id").alias("i"))
    planted = u.crossJoin(i).select(
        (-F.col("u")).alias("user_id"),
        (
            F.lit(1_000_000_000_000)
            + F.when(F.col("u") <= 10, F.col("i") * 60_000_000).otherwise(
                F.expr("i div 2") * 120_000_000
                + (F.col("i") % 2) * 40_000_000
            )
        ).cast("long").alias("us"),
        (F.col("u") * 1000 + F.col("i")).cast("long").alias("event_id"),
    )
    stream = ev.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    ).unionByName(planted)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = (F.col("us") - F.lag("us").over(w)).alias("g")
    gaps = stream.select("user_id", g).filter(F.col("g").isNotNull())
    dec = "decimal(38,0)"
    m = (
        gaps.groupBy("user_id")
        .agg(
            F.count("g").alias("n"),
            F.sum("g").cast("long").alias("s1"),
            F.sum(F.col("g").cast(dec) * F.col("g")).cast(dec).alias("s2"),
        )
        .filter(F.col("n") >= 5)
    )
    s1d = F.col("s1").cast(dec)
    spread = F.col("n") * F.col("s2") - s1d * F.col("s1")
    # ADVICE r9: non-ANSI Spark yields NULL when a decimal(38,0) product
    # exceeds precision 38 — both WHEN branches would then be false and the
    # user silently lands in 'organic' while DuckDB (which errors on decimal
    # overflow) diverges. assert_true makes Spark fail loudly at the same
    # point DuckDB would: it returns NULL when the operands are in range and
    # raises otherwise; anchoring it in the first WHEN keeps it unprunable.
    # s1 is int64 so s1² ≤ 8.6e37 < 1e38 can never overflow; the checked
    # terms are Σg² (the agg itself) and the ×100/×n products.
    chk = F.assert_true(
        (100 * spread).isNotNull(),
        F.lit(
            "q_events_bot_regularity: decimal(38,0) overflow in gap "
            "moments (n·Σg² or 100·spread exceeds precision 38)"
        ),
    )
    cls = m.select(
        "user_id",
        "n",
        F.when(chk.isNull() & (100 * spread <= s1d * F.col("s1")),
               "metronomic")
        .when(4 * spread <= s1d * F.col("s1"), "regular")
        .otherwise("organic")
        .alias("cadence"),
    )
    return cls.groupBy("cadence").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("n_gaps"),
        F.min("user_id").alias("example_user"),
    )
