"""Change-data-capture / ETL maintenance operators (SURVEY §2.L extension).

The reference's plugin family lives in an ETL toolchain, and the two
operations every warehouse-maintenance pipeline runs are (1) applying a
change feed to a base table (upsert/merge with inserts, updates, deletes)
and (2) deriving slowly-changing-dimension type-2 validity intervals from
an event stream. Both are expressed as single-shuffle DataFrame plans; the
change feed here is synthesized deterministically from the fixture tables
so the result is oracle-checkable (same derivation in both engines).

Scale: the CDC merge is one key-partitioned full-outer join — the shape a
100 TB merge needs (bucket/cluster both sides by the key; no broadcast
assumption since change feeds can be large). SCD2 is two window functions
over the same (user) partitioning — one Exchange, both windows reuse it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import ts_sec
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

# Deterministic synthetic change feed over `orders` (never rand()):
#   %13 == 0           → DELETE
#   %7  == 0 (not %13) → UPDATE price ×1.1
#   %97 == 0           → INSERT under the NEGATED key at half price
#     (negation, not key+offset: o_orderkey reaches 6M×SF, so any fixed
#      offset collides with real keys at some SF — the q_snapshot_diff
#      lesson, ADVICE r6 — while -k can never collide at any SF)
# All price math is integer cents (the _REV_SQL discipline): round(x*1.1, 2)
# on doubles lands on half-way points where Spark (HALF_UP) and DuckDB
# disagree in the last cent; cents + cents DIV 10 is exact in both.
_CENTS_SQL = "CAST(round(o_totalprice * 100) AS BIGINT)"
_CHANGES_SQL = f"""
        SELECT o_orderkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS price
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey, 'U',
               CAST({_CENTS_SQL} + {_CENTS_SQL} // 10 AS DOUBLE) / 100
        FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT -o_orderkey, 'I',
               CAST({_CENTS_SQL} // 2 AS DOUBLE) / 100
        FROM orders WHERE o_orderkey % 97 = 0
"""


@register(
    "q_cdc_upsert",
    oracle=f"""
        WITH changes AS ({_CHANGES_SQL})
        SELECT COALESCE(c.k, b.o_orderkey) AS o_orderkey,
               COALESCE(c.price, CAST({_CENTS_SQL} AS DOUBLE) / 100) AS price,
               COALESCE(c.op, 'base') AS src
        FROM orders b
        FULL JOIN changes c ON b.o_orderkey = c.k
        WHERE COALESCE(c.op, '') <> 'D'
    """,
    origin="CORE",
    doc="CDC merge (upsert-apply): a deterministic change feed (deletes, "
        "updates, inserts derived from key residues) applied to the orders "
        "base table — the MERGE INTO semantics of warehouse maintenance, "
        "expressed as ONE key-partitioned full-outer join + coalesce. "
        "Deletes drop the row, updates override columns, inserts surface "
        "keys absent from the base. No broadcast assumption: change feeds "
        "are fact-sized at 100 TB; co-partitioning (bucketing) both sides "
        "on the key is the scale path, and the plan degrades to exactly "
        "one shuffle per side either way.",
)
def q_cdc_upsert(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    updates = o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U").alias("op"),
        ((cents + F.floor(cents / 10)).cast("double") / 100).alias("price"),
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (-F.col("o_orderkey")).alias("k"),
        F.lit("I").alias("op"),
        (F.floor(cents / 2).cast("double") / 100).alias("price"),
    )
    changes = deletes.union(updates).union(inserts)
    base = o.select("o_orderkey", (cents.cast("double") / 100).alias("base_price"))
    return (
        base.join(changes, base.o_orderkey == changes.k, "full")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("k"), F.col("o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("price"), F.col("base_price")).alias("price"),
            F.coalesce(F.col("op"), F.lit("base")).alias("src"),
        )
    )


# Shared CTE block: the SCD2 interval construction, reused verbatim by the
# q_scd2_intervals oracle and as the dimension side of q_join_interval's.
_SCD2_CTES = """
        ordered AS (
            SELECT user_id, event_type,
                   date_trunc('second', ts) AS ts_s,
                   event_id,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), changes AS (
            SELECT user_id, event_type, ts_s, event_id
            FROM ordered
            WHERE prev_type IS NULL OR event_type <> prev_type
        ), intervals AS (
            SELECT user_id, event_type,
                   ts_s AS valid_from,
                   lead(ts_s) OVER w AS valid_to,
                   CAST(row_number() OVER w AS BIGINT) AS version
            FROM changes
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        )
"""


@register(
    "q_scd2_intervals",
    oracle=f"""
        WITH {_SCD2_CTES}
        SELECT user_id, event_type, valid_from, valid_to, version
        FROM intervals
    """,
    origin="CORE",
    doc="SCD type-2 interval building: per user, collapse the event stream "
        "into validity intervals [valid_from, valid_to) that open whenever "
        "event_type changes (valid_to NULL = current). Change detection is "
        "lag() over (user, ts, event_id); interval close is lead() over "
        "the surviving change rows; version numbers the history. All "
        "windows share one user_id hash partitioning — a single Exchange, "
        "reused, which is the whole cost at any scale.",
)
def q_scd2_intervals(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", ts_sec("ts").alias("ts_s"), "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    return changes.select(
        "user_id", "event_type",
        F.col("ts_s").alias("valid_from"),
        F.lead("ts_s").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


@register(
    "q_join_interval",
    oracle=f"""
        WITH {_SCD2_CTES}
        SELECT e.event_id, e.user_id,
               date_trunc('second', e.ts) AS ts_s,
               i.event_type AS state, i.version
        FROM events e JOIN intervals i
          ON e.user_id = i.user_id
         AND date_trunc('second', e.ts) >= i.valid_from
         AND (i.valid_to IS NULL
              OR date_trunc('second', e.ts) < i.valid_to)
    """,
    origin="CORE",
    doc="Point-in-interval enrichment — the lookup half of SCD2: every "
        "event joined to the validity interval [valid_from, valid_to) "
        "containing its (seconds-truncated) timestamp, yielding the "
        "dimension state and version in effect at event time. Exactly "
        "one non-empty interval covers each event by construction "
        "(intervals partition each user's timeline from the first "
        "event; an empty [x, x) interval matches nothing). Scale shape: "
        "the user_id equality is the JOIN KEY — a key-partitioned hash/"
        "sort-merge join with the range predicate as a residual filter, "
        "never a nested loop (plan-asserted): per-user interval lists "
        "are version-history-sized, so the residual scans a handful of "
        "rows per probe. No broadcast assumption — at 100 TB both the "
        "event stream and the interval dimension are fact-sized.",
)
def q_join_interval(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", ts_sec("ts").alias("ts_s")
    )
    iv = q_scd2_intervals(spark, sf_dir).select(
        F.col("user_id").alias("iv_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        "version",
    )
    cond = (
        (e.user_id == iv.iv_user)
        & (e.ts_s >= iv.valid_from)
        & (iv.valid_to.isNull() | (e.ts_s < iv.valid_to))
    )
    return e.join(iv, cond).select(
        "event_id", "user_id", "ts_s", "state", "version"
    )


# --- r6 addition: snapshot diff (the inverse of the CDC merge) ------------

_SD_CENTS = "CAST(round(c_acctbal * 100) AS BIGINT)"


@register(
    "q_snapshot_diff",
    oracle=f"""
        WITH v1 AS (
            SELECT c_custkey AS k, {_SD_CENTS} AS bal FROM customer
        ), v2 AS (
            SELECT c_custkey AS k,
                   CASE WHEN c_custkey % 10 = 0 THEN {_SD_CENTS} + 10000
                        ELSE {_SD_CENTS} END AS bal
            FROM customer WHERE c_custkey % 97 <> 0
            UNION ALL
            -- clone keys are NEGATED, not offset: a constant offset
            -- collides with real custkeys once SF grows past the offset
            -- (customer = 150k x SF rows), silently corrupting the
            -- added/changed counts; -k can never collide at any SF
            SELECT -c_custkey, {_SD_CENTS} // 2
            FROM customer WHERE c_custkey % 53 = 0
        )
        SELECT change_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(abs_delta) AS BIGINT) AS total_abs_delta_cents
        FROM (
            SELECT CASE WHEN v1.k IS NULL THEN 'added'
                        WHEN v2.k IS NULL THEN 'removed'
                        WHEN v1.bal <> v2.bal THEN 'changed'
                        ELSE 'unchanged' END AS change_type,
                   CASE WHEN v1.k IS NOT NULL AND v2.k IS NOT NULL
                        THEN abs(v2.bal - v1.bal) ELSE 0 END AS abs_delta
            FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        )
        GROUP BY change_type
    """,
    doc="Snapshot diff — the INVERSE of the CDC merge: given two table "
        "versions (v2 synthesized deterministically from v1: %97 keys "
        "deleted, %10 balances shifted, %53 keys cloned as inserts), "
        "recover the change set as added/removed/changed/unchanged counts "
        "plus the total absolute balance drift, the reconciliation report "
        "a warehouse runs to validate a replicated or migrated table. "
        "One key-partitioned full-outer join (no broadcast assumption — "
        "both snapshots are table-sized) + one map-side-combined "
        "aggregate; all value compares in exact integer cents.",
)
def q_snapshot_diff(spark, sf_dir):
    from xml_processor_spark.functions.deterministic import cents

    c = table(spark, sf_dir, "customer")
    v1 = c.select(F.col("c_custkey").alias("k"), cents("c_acctbal").alias("bal"))
    v2 = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .select(
            F.col("c_custkey").alias("k"),
            F.when(
                F.col("c_custkey") % 10 == 0, cents("c_acctbal") + 10000
            ).otherwise(cents("c_acctbal")).alias("bal"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 53 == 0).select(
                (-F.col("c_custkey")).alias("k"),
                F.expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 2").alias(
                    "bal"
                ),
            )
        )
    )
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.k") == F.col("v2.k"), "full_outer"
    )
    change_type = (
        F.when(F.col("v1.k").isNull(), "added")
        .when(F.col("v2.k").isNull(), "removed")
        .when(F.col("v1.bal") != F.col("v2.bal"), "changed")
        .otherwise("unchanged")
    )
    abs_delta = F.when(
        F.col("v1.k").isNotNull() & F.col("v2.k").isNotNull(),
        F.abs(F.col("v2.bal") - F.col("v1.bal")),
    ).otherwise(F.lit(0))
    return (
        j.select(change_type.alias("change_type"), abs_delta.alias("abs_delta"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("abs_delta").alias("total_abs_delta_cents"),
        )
    )
