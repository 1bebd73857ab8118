"""Frequency-sketch operators (SURVEY §2.K extension).

`q_heavy_hitters` is the two-pass exact heavy-hitters pattern for corpora
whose distinct-term set does NOT fit in an aggregation hash table — the
regime a 100 TB token stream lives in, where the one-shot
``groupBy(term).count()`` of `q_text_wordcount` would spill:

- **Pass 1 (sketch)**: each partition runs a Misra–Gries summary with
  ``_MG_CAP`` counters over its token stream (Arrow-batched via
  ``mapInPandas``; state is per-partition, memory is O(cap) regardless of
  partition size). MG guarantees any term with partition frequency
  > n_p/cap survives that partition's summary, so by pigeonhole any term
  with GLOBAL frequency > N/cap survives in at least one partition — the
  candidate union is a guaranteed superset of the true top-k for any
  k ≤ cap/skew.
- **Pass 2 (exact recount)**: the candidate set (≤ cap × partitions terms,
  tiny) is broadcast back and ONLY candidate terms are exactly recounted
  and ranked. The output is therefore exact, not approximate — the sketch
  only bounds the candidate set.

Determinism: the token stream is hash-repartitioned by doc_id into a fixed
partition count and sorted within partitions, so each partition processes
an identical ordered stream regardless of input splits or cluster size —
the candidate set (and hence the result) is reproducible, which is what
makes the key oracle-checkable rather than rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_MG_CAP = 400  # counters per partition
_MG_PARTS = 16  # fixed partition count (determinism, not tuning)
_TOP_K = 20


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Weighted Misra–Gries over one partition's token stream; emits the
    surviving (term, lower_bound) counters once, after the last Arrow batch.

    Batch-weighted formulation (Berinde et al. weighted-MG family): each
    Arrow batch is collapsed to (term, weight) via vectorized
    ``value_counts`` and folded into the counters, then ONE trim evicts
    down to the cap — subtract delta = the ``overflow``-th smallest value
    from every counter and drop the non-positives. Each trim removes
    >= (cap+1) * delta total weight (all >= cap+1 counters with value >=
    delta lose a full delta), so the cumulative undercount of any term is
    <= n_p/(cap+1) — strictly tighter than the classic per-token
    decrement-all, which this replaces because that inner loop was
    O(tokens * cap) Python work per partition (guide §4.1: vectorize the
    Python boundary; the per-token dict churn was the partition's whole
    cost). Persistent state stays O(cap); the transient per-batch dict is
    bounded by the Arrow batch size, not the partition.
    """
    from collections import Counter

    counters: Counter = Counter()
    for pdf in batches:
        counters.update(pdf["term"].value_counts().to_dict())
        overflow = len(counters) - _MG_CAP
        if overflow > 0:
            delta = sorted(counters.values())[overflow - 1]
            counters = Counter(
                {t: v - delta for t, v in counters.items() if v > delta}
            )
    yield pd.DataFrame(
        {"term": list(counters), "lb": list(counters.values())}
    )


@register(
    "q_heavy_hitters",
    oracle=f"""
        SELECT term, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY term
        ORDER BY n DESC, term
        LIMIT {_TOP_K}
    """,
    origin="LLM",
    doc="Two-pass exact heavy hitters: per-partition Misra-Gries sketch "
        "(O(cap) memory however large the partition) unions into a "
        "guaranteed-superset candidate set; only candidates are exactly "
        "recounted and ranked. Equals the full groupBy top-k (the oracle) "
        "whenever true top-k frequency > N/cap — the property "
        "tests/test_llm.py asserts directly. The scale story: pass 1 "
        "never shuffles token-cardinality data, pass 2 shuffles only "
        "|candidates| partial counts.",
)
def q_heavy_hitters(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tokens = (
        docs.repartition(_MG_PARTS, "doc_id")
        .sortWithinPartitions("doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    candidates = (
        tokens.mapInPandas(_mg_summaries, schema="term string, lb long")
        .select("term")
        .distinct()
    )
    return (
        tokens.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(_TOP_K)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: the one-pass MERGEABLE frequency estimator (vs MG's
# exact-after-recount two-pass).
# ---------------------------------------------------------------------------

_CMS_D = 4     # hash rows
_CMS_W = 512   # columns per row
# Probe terms spanning frequency decades (rare + common) so the error
# bound is exercised where it matters.
_CMS_PROBES = ("the", "scan", "dup", "spark", "merge", "window", "key", "batch")


@register(
    "q_sketch_cms",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ), cells AS (
            SELECT r.r,
                   CAST(concat('0x', substring(
                       md5(concat(CAST(r.r AS VARCHAR), ':', term)),
                       1, 15)) AS BIGINT) % {_CMS_W} AS c,
                   CAST(count(*) AS BIGINT) AS n
            FROM toks, (SELECT unnest(generate_series(0, {_CMS_D} - 1)) AS r) r
            GROUP BY 1, 2
        ), probes AS (
            SELECT unnest(['{"','".join(_CMS_PROBES)}']) AS term
        ), est AS (
            SELECT p.term,
                   min(cells.n) AS cms_est
            FROM probes p,
                 (SELECT unnest(generate_series(0, {_CMS_D} - 1)) AS r) pr
            JOIN cells
              ON cells.r = pr.r
             AND cells.c = CAST(concat('0x', substring(
                     md5(concat(CAST(pr.r AS VARCHAR), ':', p.term)),
                     1, 15)) AS BIGINT) % {_CMS_W}
            GROUP BY p.term
        ), exact AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n_exact
            FROM toks WHERE term IN ('{"','".join(_CMS_PROBES)}')
            GROUP BY term
        )
        SELECT e.term, x.n_exact, e.cms_est
        FROM est e JOIN exact x ON x.term = e.term
    """,
    origin="LLM",
    doc=f"Count-Min sketch — the one-pass MERGEABLE frequency estimator "
        f"({_CMS_D} portable-hash rows x {_CMS_W} columns): every token "
        "increments one cell per row, per-cell counts merge by plain SUM "
        "at any partitioning (the property that lets a 1000-executor job "
        "maintain one global sketch with a constant-size shuffle), and a "
        "term's estimate is the MIN over its row cells — always >= the "
        "true count, overshooting only by colliding mass (bounded in "
        "expectation by N/w per row). Output pairs each probe term's "
        "exact count with its estimate so the error is visible and "
        "hash-checked. The md5-derived hash family is bit-identical in "
        "both engines, so the entire sketch (not just its contract) is "
        "oracle-verified. Scale shape: one map-side-combined groupBy "
        f"onto <= {_CMS_D * _CMS_W} cells, then an 8-term probe join.",
)
def q_sketch_cms(spark, sf_dir):
    from xml_processor_spark.io import widen

    d = widen(table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    rows = F.sequence(F.lit(0), F.lit(_CMS_D - 1))
    # Per-cell counts are additive over term groups (sum_t count_t * 1[h_r(t)=c]
    # == count of token instances landing in the cell), so aggregate to the
    # distinct-term counts FIRST: md5 runs once per (vocab term, row) instead
    # of once per (token instance, row) — D x corpus-size fewer hashes — and
    # the exact-count probe branch reuses the same aggregate instead of
    # re-scanning documents (one parquet scan, ReusedExchange, guide §2.3).
    term_counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    cell = (
        term_counts.select("term", "cnt", F.explode(rows).alias("r"))
        .select(
            "cnt",
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.col("r").cast("string"), F.col("term")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CMS_W
            ).alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("n"))
    )
    probes = spark.createDataFrame(
        [(t,) for t in _CMS_PROBES], ["term"]
    ).select("term", F.explode(rows).alias("r"))
    probes = probes.select(
        "term",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("r").cast("string"), F.col("term")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("c"),
    )
    est = (
        probes.join(F.broadcast(cell), ["r", "c"])
        .groupBy("term")
        .agg(F.min("n").alias("cms_est"))
    )
    exact = term_counts.filter(F.col("term").isin(*_CMS_PROBES)).select(
        "term", F.col("cnt").alias("n_exact")
    )
    return exact.join(est, "term").select("term", "n_exact", "cms_est")


# --- KMV (k-minimum-values) distinct sketch with set algebra ----------------
#
# The mergeable distinct-count sketch: keep the k smallest values of a
# uniform hash; D-hat = (k-1) * H / h_k (H = hash range). Union of two
# sketches = k smallest of the merged min-sets; intersection by
# inclusion-exclusion. Deterministic because the hash is phash60 (md5-based,
# bit-identical in both engines) and min-k is order-free.
_KMV_K = 64  # small enough that the estimator path engages at test SFs
_KMV_RANGE = float(1 << 60)
_KMV_SALT = 16  # stage-1 fan-out for the distributed min-k

_KMV_HASH_SQL = (
    "CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


@register(
    "q_kmv_union",
    oracle=f"""
        WITH hu AS (
            SELECT DISTINCT
                   CASE WHEN date_part('day', ts) % 2 = 0
                        THEN 'H1' ELSE 'H2' END AS side,
                   {_KMV_HASH_SQL} AS h
            FROM events
        ),
        ranked AS (
            SELECT side, h,
                   row_number() OVER (PARTITION BY side ORDER BY h) AS rn
            FROM hu
        ),
        sk AS (
            SELECT side, CAST(count(*) AS BIGINT) AS n_min,
                   CAST(max(h) AS BIGINT) AS hk
            FROM ranked WHERE rn <= {_KMV_K} GROUP BY side
        ),
        ex AS (
            SELECT side, CAST(count(*) AS BIGINT) AS n_exact
            FROM hu GROUP BY side
        ),
        est AS (
            SELECT sk.side, ex.n_exact,
                   CASE WHEN ex.n_exact <= {_KMV_K}
                        THEN CAST(ex.n_exact AS DOUBLE)
                        ELSE ({_KMV_K} - 1) * {_KMV_RANGE} / sk.hk
                   END AS d_hat
            FROM sk JOIN ex ON sk.side = ex.side
        ),
        merged AS (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM ranked WHERE rn <= {_KMV_K})
        ),
        usk AS (
            SELECT CAST(count(*) AS BIGINT) AS n_min,
                   CAST(max(h) AS BIGINT) AS hk
            FROM merged WHERE rn <= {_KMV_K}
        ),
        uex AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_exact FROM hu),
        uest AS (
            SELECT uex.n_exact,
                   CASE WHEN usk.n_min < {_KMV_K}
                        THEN CAST(usk.n_min AS DOUBLE)
                        ELSE ({_KMV_K} - 1) * {_KMV_RANGE} / usk.hk
                   END AS d_hat
            FROM usk, uex
        )
        SELECT {_KMV_K} AS k,
               a.n_exact AS exact_h1, b.n_exact AS exact_h2,
               uest.n_exact AS exact_union,
               round(a.d_hat, 2) AS est_h1,
               round(b.d_hat, 2) AS est_h2,
               round(uest.d_hat, 2) AS est_union,
               round(a.d_hat + b.d_hat - uest.d_hat, 2) AS est_intersect
        FROM est a, est b, uest
        WHERE a.side = 'H1' AND b.side = 'H2'
    """,
    origin="LLM",
    doc="KMV (k-minimum-values) distinct-user sketch over two corpus "
        "halves (H1/H2 by event-day parity — both populated for any "
        "corpus span, with a real user overlap) with sketch ALGEBRA: per-side "
        "estimate (k−1)·2⁶⁰/h_k, union = k smallest of the merged "
        "min-sets, intersection by inclusion-exclusion — the mergeable "
        "cardinality machinery behind cross-partition distinct counts "
        "(exact counts included for QA contrast; sketch falls back to "
        "exact when a side has ≤ k distincts). Hash = phash60 (md5), "
        "bit-identical across engines, so the sketch is DETERMINISTIC — "
        "no HLL register noise. Scale shape: ONE (side, h) distinct "
        "fact pass, PINNED (localCheckpoint, executor-local, ∝|users|) "
        "so the min-k sketch, the per-side exacts, and the union exact "
        "all reuse it instead of re-scanning the fact per branch; then "
        "a TWO-STAGE distributed min-k (16-way salted partial top-k → "
        "bounded final top-k) instead of the oracle's single global "
        "sort; everything after runs on ≤2k rows.",
)
def q_kmv_union(spark, sf_dir):
    from pyspark.sql import Window

    from xml_processor_spark.functions.deterministic import phash60

    ev = table(spark, sf_dir, "events")
    hu = (
        ev.select(
            F.when(F.dayofmonth("ts") % 2 == 0, "H1")
            .otherwise("H2")
            .alias("side"),
            phash60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
        # ≤2·|users| rows. Pin it: the min-k path, the per-side exact
        # counts, and the union exact count all derive from this ONE
        # fact pass — without the pin Catalyst re-scans events per
        # branch (observed: 3 scans). Executor-local checkpoint storage
        # is ∝|users|, fine at any sf (distributed, never the driver).
        .localCheckpoint()
    )
    # two-stage distributed min-k (global-sort-free)
    w1 = Window.partitionBy("side", F.pmod(F.col("h"), F.lit(_KMV_SALT))).orderBy("h")
    stage1 = hu.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= _KMV_K
    ).drop("rn")
    w2 = Window.partitionBy("side").orderBy("h")
    mins = (
        stage1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _KMV_K)
        .localCheckpoint()  # ≤2k rows: pin so union/exact reuse it
    )
    sk = mins.groupBy("side").agg(
        F.count(F.lit(1)).alias("n_min"), F.max("h").alias("hk")
    )
    ex = hu.groupBy("side").agg(F.count(F.lit(1)).alias("n_exact"))
    est = sk.join(ex, "side").select(
        "side", "n_exact",
        F.when(
            F.col("n_exact") <= _KMV_K, F.col("n_exact").cast("double")
        ).otherwise(
            F.lit(float(_KMV_K - 1)) * F.lit(_KMV_RANGE) / F.col("hk")
        ).alias("d_hat"),
    )
    w_m = Window.partitionBy().orderBy("h")
    usk = (
        mins.select("h").distinct()
        .withColumn("rn", F.row_number().over(w_m))
        .filter(F.col("rn") <= _KMV_K)
        .agg(F.count(F.lit(1)).alias("n_min"), F.max("h").alias("hk"))
    )
    uex = hu.select("h").distinct().agg(F.count(F.lit(1)).alias("n_exact"))
    uest = usk.crossJoin(F.broadcast(uex)).select(
        "n_exact",
        F.when(
            F.col("n_min") < _KMV_K, F.col("n_min").cast("double")
        ).otherwise(
            F.lit(float(_KMV_K - 1)) * F.lit(_KMV_RANGE) / F.col("hk")
        ).alias("d_hat"),
    )
    a = est.filter(F.col("side") == "H1").select(
        F.col("n_exact").alias("exact_h1"), F.col("d_hat").alias("da")
    )
    b = est.filter(F.col("side") == "H2").select(
        F.col("n_exact").alias("exact_h2"), F.col("d_hat").alias("db")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(uest))
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            "exact_h1", "exact_h2",
            F.col("n_exact").alias("exact_union"),
            F.round("da", 2).alias("est_h1"),
            F.round("db", 2).alias("est_h2"),
            F.round("d_hat", 2).alias("est_union"),
            F.round(F.col("da") + F.col("db") - F.col("d_hat"), 2)
            .alias("est_intersect"),
        )
    )
