"""Streaming semantics, batch-checked (SURVEY §2.I).

Spark's unified batch/stream API means these exact plans re-run under
``readStream`` unchanged — the batch results here are the golden answers
for the streaming replays in tests/test_streaming.py (E-WATERMARK,
E-STATEFUL, E-STREAM-JOIN). This mirrors the reference's XMLReader
tracking-table semantics [P]: its incremental file processing is Spark's
checkpointed file source.

Boundary discipline: Spark windows are start-inclusive / end-exclusive and
epoch-aligned; session gap merges strictly-less-than the gap. The DuckDB
oracles encode the same boundaries explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import ts_sec
from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_stream_tumbling",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
               count(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="1-hour tumbling window count/sum per event_type (F.window; "
        "start-inclusive, end-exclusive, epoch-aligned — matches "
        "time_bucket).",
)
def q_stream_tumbling(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / 100)
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


@register(
    "q_stream_sliding",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) - INTERVAL 45 MINUTE AS lo,
                   max(ts) AS hi
            FROM events
        ), starts AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS ws
            FROM bounds
        )
        SELECT s.ws AS w_start, count(*) AS n
        FROM starts s JOIN events e
          ON e.ts >= s.ws AND e.ts < s.ws + INTERVAL 1 HOUR
        GROUP BY s.ws
    """,
    doc="1-hour window sliding every 15 min (each event lands in 4 "
        "windows); oracle is a generate_series range join with the same "
        "[start, start+1h) boundaries.",
)
def q_stream_sliding(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


@register(
    "q_stream_session",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               date_trunc('second', min(ts)) AS session_start,
               date_trunc('second', max(ts)) AS last_event,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, sid
    """,
    doc="30-min-gap session windows per user (session_window merges while "
        "gap < 30 min; the gaps-and-islands oracle splits on >= 30 min — "
        "identical boundary).",
)
def q_stream_session(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            ts_sec(F.min("ts")).alias("session_start"),
            ts_sec(F.max("ts")).alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


@register(
    "q_stream_dedup",
    oracle="""
        SELECT DISTINCT event_id, event_type, value
        FROM (
            SELECT event_id, event_type, value FROM events
            UNION ALL
            SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 0
        )
    """,
    doc="Exactly-once dedup on event_id over a stream with injected "
        "duplicates (dropDuplicates ≡ streaming dedup state; duplicate "
        "rows are identical so the survivor is well-defined).",
)
def q_stream_dedup(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dup = e.filter(F.col("event_id") % 3 == 0)
    return e.unionAll(dup).dropDuplicates(["event_id"])


@register(
    "q_rollup_two_level",
    oracle="""
        WITH hourly AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS h,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(date_trunc('day', h) AS DATE) AS d,
               event_type,
               CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(cents) AS DOUBLE) / 100 AS sum_value,
               CAST(count(*) AS BIGINT) AS n_hours
        FROM hourly
        GROUP BY 1, 2
    """,
    doc="Two-level continuous-aggregate rollup (the hypertable pattern): "
        "hourly (count, integer-cents sum) per event_type, then the DAILY "
        "aggregate computed FROM the hourly partials — never re-scanning "
        "raw events. Count and cents re-aggregate exactly because both are "
        "associative integer sums (an avg would need (sum, n) carried "
        "down, which cents+n provides). At 100 TB the hourly layer is the "
        "materialized rollup; every coarser granularity (day, month) "
        "reduces ~24x fewer rows instead of re-reading the fact table. "
        "The Spark plan is two cascaded partial+final hash aggregations; "
        "the second input is |hours x types| rows — negligible.",
)
def q_rollup_two_level(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "cents")
    )
    return (
        hourly.groupBy(F.to_date(F.date_trunc("day", "h")).alias("d"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            (F.sum("cents").cast("double") / 100).alias("sum_value"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


@register(
    "q_gapfill",
    oracle="""
        WITH hourly AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ), spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        )
        SELECT s.h AS w_start, t.event_type,
               COALESCE(hourly.n, 0) AS n
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN hourly ON hourly.h = s.h AND hourly.event_type = t.event_type
    """,
    doc="Time-series gap filling: a dense hourly spine (min..max hour x "
        "every event_type) left-joined to the sparse hourly counts, "
        "missing buckets zero-filled — what a monitoring/feature pipeline "
        "needs before windowed models (gaps would silently shift moving "
        "averages). The spine is generated JVM-side (sequence + explode "
        "over a 1-row bounds aggregate broadcast onto the type list) — "
        "never a driver-side loop; its size is |hours| x |types|, "
        "independent of event count, so the left join is spine-small vs "
        "facts-large with the usual key shuffle.",
)
def q_gapfill(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("h"), "event_type", "n")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["h", "event_type"], "left")
        .select(
            F.col("h").alias("w_start"), "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


# Lateness audit: arrival order is event_id (the feed's ingestion
# sequence); event time is ts. Bucket width for the distributed prefix
# scan — the bucket aggregate is |events|/4096 rows, one more scan level
# bounds any corpus.
_LATE_BUCKET = 4096
_LATE_CLASSES_SQL = """
    CASE WHEN late_us <= 0 THEN 'on_time'
         WHEN late_us <= 60000000 THEN 'le_1m'
         WHEN late_us <= 300000000 THEN 'le_5m'
         WHEN late_us <= 3600000000 THEN 'le_1h'
         ELSE 'gt_1h' END
"""


@register(
    "q_events_lateness",
    oracle=f"""
        WITH feed AS (
            SELECT event_id,
                   ts - to_microseconds(
                       CASE WHEN event_id % 11 = 0
                            THEN ((event_id % 89) + 1) * 60 * 1000000
                            ELSE 0 END) AS ts
            FROM events
        ), seq AS (
            SELECT event_id, ts,
                   max(ts) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pmax
            FROM feed
        ), late AS (
            SELECT greatest(CAST(0 AS BIGINT),
                            epoch_us(pmax) - epoch_us(ts)) AS late_us
            FROM seq WHERE pmax IS NOT NULL
        ), cls AS (
            SELECT {_LATE_CLASSES_SQL} AS lateness,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(max(late_us) AS BIGINT) AS max_late_us
            FROM late GROUP BY 1
        )
        SELECT lateness, n, max_late_us,
               round(CAST(n AS DOUBLE)
                     / CAST(sum(n) OVER () AS DOUBLE), 6) AS share
        FROM cls
    """,
    doc="Watermark-design audit: how late does event time run behind "
        "arrival order (event_id = ingestion sequence)? The fixture feed "
        "is perfectly ordered, so an out-of-order feed is DERIVED "
        "deterministically (the q_snapshot_diff discipline): every 11th "
        "event is a straggler whose event time is pulled back "
        "(event_id % 89 + 1) minutes — a 9% straggler rate spanning "
        "1..89 min, populating every watermark class. For every event, "
        "lateness = (max event-time of all STRICTLY earlier arrivals) − "
        "own event time, bucketed into the watermark-delay classes a "
        "stream designer actually chooses between (on-time/1m/5m/1h/"
        "worse) with exact integer microsecond compares. The global "
        "prefix max — a single-partition window if written naively — is "
        "computed as a two-level distributed scan: per-bucket maxima "
        f"(|events|/{_LATE_BUCKET} rows) get an exclusive running max in "
        "one bounded window, then each event combines its bucket's "
        "carry-in with a WITHIN-bucket exclusive running max (window "
        "partitioned by bucket). This is the textbook parallel "
        "prefix-scan shape; one more level bounds any corpus. The DuckDB "
        "oracle states the same semantics as the naive global window.",
)
def q_events_lateness(spark, sf_dir):
    from pyspark.sql import Window

    delay_us = F.when(
        F.col("event_id") % 11 == 0,
        ((F.col("event_id") % 89) + 1) * 60 * 1_000_000,
    ).otherwise(F.lit(0))
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.timestamp_micros(F.unix_micros("ts") - delay_us).alias("ts"),
        (F.col("event_id") / _LATE_BUCKET).cast("long").alias("b"),
    )
    # Level 1: per-bucket max, then the exclusive carry-in per bucket.
    # The window is over |events|/_LATE_BUCKET rows — bounded enough for
    # one level here; a 100 TB feed adds one more bucketing level.
    wb = (
        Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        ev.groupBy("b")
        .agg(F.max("ts").alias("bmax"))
        .select("b", F.max("bmax").over(wb).alias("carry_in"))
    )
    # Level 2: within-bucket exclusive running max, combined with the
    # bucket's carry-in. Partitioned by bucket — scales.
    ww = (
        Window.partitionBy("b")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.join(carry, "b").select(
        "event_id",
        "ts",
        F.greatest(
            F.max("ts").over(ww), F.col("carry_in")
        ).alias("pmax"),
    )
    late = seq.where(F.col("pmax").isNotNull()).select(
        F.greatest(
            F.lit(0).cast("long"),
            F.unix_micros("pmax") - F.unix_micros("ts"),
        ).alias("late_us")
    )
    cls = (
        late.select(F.expr(_LATE_CLASSES_SQL).alias("lateness"), "late_us")
        .groupBy("lateness")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("late_us").cast("long").alias("max_late_us"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cls.select(
        "lateness",
        "n",
        "max_late_us",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wall).cast("double"),
            6,
        ).alias("share"),
    )
