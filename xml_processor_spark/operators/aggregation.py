"""Aggregation (SURVEY §2.D) — hash aggregation with partial/final split.

Spark's groupBy().agg() plans a partial (map-side) + final (post-shuffle)
HashAggregate automatically — the property that keeps a 100 TB group-by
shuffle proportional to |groups|, not |rows|. Cross-engine float determinism
comes from :mod:`xml_processor_spark.functions.deterministic`: exact decimal
sums, 6 dp rounding of moments.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import (
    cents,
    cents_sql,
    dsum,
    dsum_sql,
    ha_sql,
    r6,
)
from xml_processor_spark.io import table, register_views
from xml_processor_spark.registry import register


@register(
    "q_agg_global",
    oracle=f"""
        SELECT count(*) AS cnt,
               {dsum_sql('l_quantity')} AS sum_qty,
               round(avg(l_quantity), 6) AS avg_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem
    """,
    doc="Ungrouped sum/avg/min/max/count over lineitem.",
)
def q_agg_global(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
        r6(F.avg("l_quantity")).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "q_agg_group",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty,
               {dsum_sql('l_extendedprice')} AS sum_base_price,
               CAST(SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS DOUBLE) / 1e4 AS sum_disc_price,
               CAST(SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')}) * (100 + {cents_sql('l_tax')})) AS DOUBLE) / 1e6 AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship, TPC-H Q1 shape: 8 aggregates over (returnflag, linestatus).",
)
def q_agg_group(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    # Exact fixed-point arithmetic → order-independent, cross-engine-exact
    # sums of prices (see deterministic.cents docstring). Two-level plan:
    # the hot path (per input partition) sums 64-bit integers — codegen'd,
    # as fast as double sums, measured 1.8x faster than summing
    # DECIMAL(30,4) directly — and only the tiny per-partition partials
    # (|groups| x |partitions| rows) are summed as decimal, which both
    # keeps the hot path integer and makes the total overflow-proof at
    # 100 TB (a partition sums ~1e6 rows x <=1e11/row << 2^63; the decimal
    # final sum is unbounded).
    # Aggregate expressions as JVM-parsed SQL strings (guide §5 driver
    # overhead: the Column-API formulation cost ~1,200 py4j round-trips
    # per invocation). cents() == CAST(ha_sql(v*100) AS BIGINT) — the
    # identical half-away codegen arithmetic, exact on any sign.
    def _cents_s(c):
        return f"CAST({ha_sql(f'({c}) * 100')} AS BIGINT)"

    pc = _cents_s("l_extendedprice")
    dc = f"(100 - {_cents_s('l_discount')})"
    tc = f"(100 + {_cents_s('l_tax')})"
    part = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        F.expr("sum(CAST(round(l_quantity * 10000, 0) AS BIGINT)) AS p_qty"),
        F.expr(
            "sum(CAST(round(l_extendedprice * 10000, 0) AS BIGINT)) AS p_price"
        ),
        # pc carries 1e2 scale, dc/tc 1e2 each → product is 1e4
        # (disc_price) / 1e6 (charge) above true value.
        F.expr(f"sum({pc} * {dc}) AS p_disc"),
        F.expr(f"sum({pc} * {dc} * {tc}) AS p_charge"),
        F.expr(f"sum({_cents_s('l_discount')}) AS p_disc_c"),
        F.expr("count(1) AS p_n"),
    )
    dec = "DECIMAL(38,0)"
    sum_qty = f"CAST(sum(CAST(p_qty AS {dec})) AS DOUBLE) / 1e4"
    sum_price = f"CAST(sum(CAST(p_price AS {dec})) AS DOUBLE) / 1e4"
    return part.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(f"{sum_qty} AS sum_qty"),
        F.expr(f"{sum_price} AS sum_base_price"),
        F.expr(
            f"CAST(sum(CAST(p_disc AS {dec})) AS DOUBLE) / 1e4"
            " AS sum_disc_price"
        ),
        F.expr(
            f"CAST(sum(CAST(p_charge AS {dec})) AS DOUBLE) / 1e6"
            " AS sum_charge"
        ),
        F.expr(f"round({sum_qty} / sum(p_n), 6) AS avg_qty"),
        F.expr(f"round({sum_price} / sum(p_n), 6) AS avg_price"),
        F.expr(
            f"round(CAST(sum(CAST(p_disc_c AS {dec})) AS DOUBLE) / 100"
            " / sum(p_n), 6) AS avg_disc"
        ),
        F.expr("sum(p_n) AS count_order"),
    )


@register(
    "q_agg_having",
    oracle="""
        SELECT c_nationkey, count(*) AS n_cust
        FROM customer
        GROUP BY c_nationkey
        HAVING count(*) > 40
    """,
    doc="Groups filtered post-aggregation (HAVING).",
)
def q_agg_having(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 40)
    )


@register(
    "q_agg_count_distinct",
    oracle="""
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) per group.",
)
def q_agg_count_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


@register(
    "q_agg_multi_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two distinct aggregates in one query (Expand-based plan).",
)
def q_agg_multi_distinct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# Unique ordering value: retailprice dominates, partkey breaks ties exactly
# (both terms exact in double at these magnitudes; identical IEEE ops in both
# engines → identical argmin/argmax winners).
_ORD = "p_retailprice * 1000000 + p_partkey"


@register(
    "q_agg_minby_maxby",
    oracle=f"""
        SELECT p_brand,
               arg_min(p_name, {_ORD}) AS cheapest,
               arg_max(p_name, {_ORD}) AS priciest,
               min(p_retailprice) AS min_price,
               max(p_retailprice) AS max_price
        FROM part GROUP BY p_brand
    """,
    doc="arg-min/arg-max with a unique tie-broken ordering value "
        "(min_by/max_by over ties is nondeterministic — banned by SURVEY §2).",
)
def q_agg_minby_maxby(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    ordv = F.col("p_retailprice") * 1000000 + F.col("p_partkey")
    return p.groupBy("p_brand").agg(
        F.min_by("p_name", ordv).alias("cheapest"),
        F.max_by("p_name", ordv).alias("priciest"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


@register(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Sample stddev/variance/correlation/covariance, rounded.",
)
def q_agg_stats(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r6(F.var_samp("l_quantity")).alias("var_qty"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
    )


@register(
    "q_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
               round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (both engines linear-interpolate).",
)
def q_agg_percentile(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.percentile("l_quantity", 0.5)).alias("med_qty"),
        r6(F.percentile("l_quantity", 0.9)).alias("p90_qty"),
    )


@register(
    "q_agg_collect_sorted",
    oracle="""
        SELECT n.n_name, string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers
        FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="Per-nation sorted list of supplier names, serialized to a string "
        "(sort_array(collect_list) — deterministic across partitionings).",
)
def q_agg_collect_sorted(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias("suppliers")
        )
    )


@register(
    "q_agg_rollup",
    oracle="""
        SELECT r.r_name, n.n_name, count(*) AS n_cust
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP region→nation customer counts (NULL-marked subtotal rows).",
)
def q_agg_rollup(spark, sf_dir):
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    j = r.join(n, n.n_regionkey == r.r_regionkey).join(
        c, c.c_nationkey == n.n_nationkey
    )
    return j.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_cust"))


@register(
    "q_agg_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty,
               count(*) AS cnt
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus).",
)
def q_agg_cube(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               {dsum_sql('l_extendedprice')} AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS with grouping() markers (via spark.sql).",
)
def q_agg_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "E-APPROX-CD",
    oracle=None,  # HLL estimate is engine-dependent → rows-only check.
    doc="approx_count_distinct (HyperLogLog++); unit test asserts ±5% of "
        "exact. The 100 TB path for cardinality estimation.",
)
def e_approx_cd(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        # rsd=0.02 → ±5% test bound holds with margin; sketch stays tiny.
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_cust")
    )


@register(
    "E-APPROX-QUANT",
    oracle=None,  # sketch estimates are engine-dependent → rows-only check.
    doc="approx_percentile (Greenwald-Khanna-style mergeable sketch) of "
        "l_extendedprice per returnflag at p25/p50/p75/p95, accuracy "
        "parameter 10000. The 100 TB path for quantiles: the sketch merges "
        "associatively across partitions (map-side partials, tiny shuffle), "
        "where the exact percentile would sort the column. Unit test "
        "asserts every estimate within 1% of the exact interpolated "
        "quantile (tests/test_llm.py).",
)
def e_approx_quant(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    pcts = F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.95)])
    q = F.approx_percentile("l_extendedprice", pcts, F.lit(10000))
    return li.groupBy("l_returnflag").agg(
        q.getItem(0).alias("p25"),
        q.getItem(1).alias("p50"),
        q.getItem(2).alias("p75"),
        q.getItem(3).alias("p95"),
    )


@register(
    "q_agg_mode",
    oracle="""
        WITH c AS (
            SELECT l_returnflag, l_quantity AS v, count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ), r AS (
            SELECT l_returnflag, v, n,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY n DESC, v ASC) AS rn
            FROM c
        )
        SELECT l_returnflag, v AS mode_value,
               CAST(n AS BIGINT) AS n_occurrences
        FROM r WHERE rn = 1
    """,
    doc="Deterministic mode (most frequent value) of l_quantity per "
        "returnflag: count per (group, value), then rank by (count DESC, "
        "value ASC) — the explicit tie-break native mode() functions lack "
        "(DuckDB's mode() picks an arbitrary tied value; this formulation "
        "is reproducible on both engines and at any partitioning). Two "
        "map-side-combined aggregations + a window over |groups x values| "
        "rows, never a per-row shuffle.",
)
def q_agg_mode(spark, sf_dir):
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    counts = (
        li.groupBy("l_returnflag", F.col("l_quantity").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("v").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("v").alias("mode_value"),
            F.col("n").cast("long").alias("n_occurrences"),
        )
    )


@register(
    "q_agg_salted_skew",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 1e2 AS total
        FROM events
        GROUP BY event_type
    """,
    origin="CORE",
    doc="Two-phase salted aggregation for skewed group keys: phase 1 "
        "groups by (event_type, salt=xxhash64(event_id)%32) so each of "
        "the 5 hot keys spreads over 32 reducers; phase 2 re-aggregates "
        "the 5x32 partials. Identical result to the plain groupBy (the "
        "oracle). Spark's map-side partial aggregation already handles "
        "LOW-cardinality skew like this fixture; the explicit salt is the "
        "pattern for the 100 TB case partials can't fix — high-cardinality "
        "key spaces with a few heavy keys (a hot user, an empty-string "
        "token), where one reducer would otherwise take the whole key.",
)
def q_agg_salted_skew(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(32)).alias("salt"),
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents("value")).alias("pcents"),
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("pcents").cast("double") / 1e2).alias("total"),
    )


@register(
    "q_agg_bool_bit",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_discount >= 0.09) AS any_deep_discount,
               CAST(bit_and(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qty_bit_and,
               CAST(bit_or(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qty_bit_or,
               CAST(bit_xor(l_orderkey) AS BIGINT) AS key_bit_xor
        FROM lineitem
        GROUP BY l_returnflag
    """,
    origin="CORE",
    doc="Boolean and bitwise aggregate family: bool_and/bool_or over "
        "predicates (the constraint-holds-everywhere / violation-exists "
        "reductions data-quality gates use) and bit_and/bit_or/bit_xor "
        "over integer columns (bitmask accumulation; bit_xor is the "
        "order-independent checksum trick for comparing key sets without "
        "sorting). All are commutative-associative single-pass "
        "aggregates — map-side combined, one shuffle of |groups| rows.",
)
def q_agg_bool_bit(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity", 0).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") >= 0.09).alias("any_deep_discount"),
        F.bit_and(qty).alias("qty_bit_and"),
        F.bit_or(qty).alias("qty_bit_or"),
        F.bit_xor("l_orderkey").alias("key_bit_xor"),
    )


_HIST_LO = 0.0
_HIST_HI = 500000.0  # measured o_totalprice max ~499979; top edge clamps
_HIST_NBUCKETS = 20


@register(
    "q_agg_histogram",
    oracle=f"""
        SELECT CAST(least(greatest(floor((o_totalprice - {_HIST_LO})
                        / (({_HIST_HI} - {_HIST_LO}) / {_HIST_NBUCKETS})),
                    0), {_HIST_NBUCKETS} - 1) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(min(o_totalprice), 2) AS lo_val,
               round(max(o_totalprice), 2) AS hi_val
        FROM orders
        GROUP BY 1
    """,
    doc=f"Fixed-width histogram of order totals ({_HIST_NBUCKETS} buckets "
        f"over [{_HIST_LO}, {_HIST_HI}), clamped at the edges) — the "
        "profiling primitive behind every distribution dashboard and "
        "equi-width binning step. The bucket id is pure scan-side "
        "arithmetic, so the aggregate is one map-side-combined groupBy "
        "over at most |buckets| keys: shuffle size is |buckets| x tasks "
        "regardless of row count — the same shape at 100 TB.",
)
def q_agg_histogram(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    width = (_HIST_HI - _HIST_LO) / _HIST_NBUCKETS
    bucket = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - _HIST_LO) / width), F.lit(0)
        ),
        F.lit(_HIST_NBUCKETS - 1),
    ).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo_val"),
            F.round(F.max("o_totalprice"), 2).alias("hi_val"),
        )
    )


# --- r6 additions: weighted aggregates, join-key skew diagnostic ----------


@register(
    "q_agg_weighted",
    oracle="""
        WITH t AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS w,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS xc
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(sum(w) AS BIGINT) AS total_w,
               round(CAST(sum(w * xc) AS DOUBLE)
                     / CAST(sum(w) AS DOUBLE) / 100, 6) AS wmean_price,
               round((CAST(sum(CAST(w AS DECIMAL(38,0))
                               * CAST(xc AS DECIMAL(38,0))
                               * CAST(xc AS DECIMAL(38,0))) AS DOUBLE)
                      / CAST(sum(w) AS DOUBLE)
                      - (CAST(sum(w * xc) AS DOUBLE)
                         / CAST(sum(w) AS DOUBLE)) ^ 2) / 10000, 4)
                   AS wvar_price
        FROM t GROUP BY l_returnflag
    """,
    doc="Quantity-weighted price mean and population variance per flag — "
        "the weighted aggregates behind mixture-weighted corpus stats. "
        "Every sum is exact integer/decimal arithmetic (weights are "
        "integer-valued, prices fixed to cents; the w*x^2 sum runs in "
        "DECIMAL(38) because cents^2 x quantity x rows overflows int64), "
        "so group results are order-independent at any partitioning; the "
        "single float division + rounding happens once per group.",
)
def q_agg_weighted(spark, sf_dir):
    from xml_processor_spark.functions.deterministic import cents

    li = table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("long")
    xc = cents("l_extendedprice")
    t = li.select(
        "l_returnflag",
        w.alias("w"),
        xc.alias("xc"),
    )
    sum_w = F.sum("w")
    sum_wx = F.sum(F.col("w") * F.col("xc"))
    sum_wx2 = F.sum(
        F.col("w").cast("decimal(38,0)")
        * F.col("xc").cast("decimal(38,0)")
        * F.col("xc").cast("decimal(38,0)")
    )
    wmean_cents = sum_wx.cast("double") / sum_w.cast("double")
    return t.groupBy("l_returnflag").agg(
        sum_w.alias("total_w"),
        F.round(wmean_cents / 100, 6).alias("wmean_price"),
        F.round(
            (sum_wx2.cast("double") / sum_w.cast("double") - wmean_cents ** 2)
            / 10000,
            4,
        ).alias("wvar_price"),
    )


_SKEW_TOP = 10


@register(
    "q_skew_stats",
    oracle=f"""
        WITH per_key AS (
            SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey
        ), g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   round(avg(n), 6) AS avg_n
            FROM per_key
        )
        SELECT rank, k, n, n_keys, avg_n,
               round(n / avg_n, 6) AS skew_vs_avg
        FROM (
            SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS rank
            FROM per_key
        ), g
        WHERE rank <= {_SKEW_TOP}
    """,
    doc=f"Join-key skew diagnostic: per-key cardinality of the orders "
        f"custkey (the join key the salted operators protect), top-"
        f"{_SKEW_TOP} heaviest keys with their skew factor vs the mean — "
        "the measurement a pipeline runs BEFORE choosing between plain "
        "hash join, AQE skew handling, and explicit salting "
        "(q_join_salted / q_agg_salted_skew). One map-side-combined "
        "count, then a distributed TakeOrderedAndProject for the top-10 "
        "— NEVER a global window over the per-key table (|keys| is "
        "customer-dimension-sized; the rank is assigned on the already-"
        f"limited {_SKEW_TOP}-row result, where a single partition is a "
        "constant). The 1-row global stats broadcast.",
)
def q_skew_stats(spark, sf_dir):
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    g = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.avg("n"), 6).alias("avg_n"),
    )
    top = per_key.orderBy(F.col("n").desc(), "k").limit(_SKEW_TOP)
    w = Window.orderBy(F.col("n").desc(), "k")  # over <= _SKEW_TOP rows
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(g))
        .select(
            "rank", "k", "n", "n_keys", "avg_n",
            F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_vs_avg"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise feature-correlation matrix (the pre-training feature scan).
# ---------------------------------------------------------------------------

# Integer units per column: exact BIGINT sums at any partitioning. The
# combine step (n*Sxy - Sx*Sy etc.) runs in DOUBLE on both engines — the
# inputs are identical exact integers, so the IEEE products round
# identically and the 6-dp corr matches bit-for-bit. int64 headroom:
# sum(price^2) <= rows * (1e5)^2, safe to ~9e8 rows per Spark task's
# partial sum; beyond that the same expression lifts to DECIMAL(38,0).
_CORR_COLS = (
    ("qty", "CAST(round(l_quantity) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice) AS BIGINT)"),
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"),
)
_CORR_PAIRS = tuple(
    (_CORR_COLS[i][0], _CORR_COLS[j][0])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
)


def _corr_oracle_sql() -> str:
    base = ", ".join(f"{expr} AS {name}" for name, expr in _CORR_COLS)
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for name, _ in _CORR_COLS:
        sums.append(f"sum({name}) AS s_{name}")
        sums.append(f"sum({name} * {name}) AS ss_{name}")
    for x, y in _CORR_PAIRS:
        sums.append(f"sum({x} * {y}) AS sp_{x}_{y}")
    rows = []
    for x, y in _CORR_PAIRS:
        num = (f"(CAST(n AS DOUBLE) * CAST(sp_{x}_{y} AS DOUBLE)"
               f" - CAST(s_{x} AS DOUBLE) * CAST(s_{y} AS DOUBLE))")
        dx = (f"(CAST(n AS DOUBLE) * CAST(ss_{x} AS DOUBLE)"
              f" - CAST(s_{x} AS DOUBLE) * CAST(s_{x} AS DOUBLE))")
        dy = (f"(CAST(n AS DOUBLE) * CAST(ss_{y} AS DOUBLE)"
              f" - CAST(s_{y} AS DOUBLE) * CAST(s_{y} AS DOUBLE))")
        rows.append(
            f"SELECT '{x}' AS col_x, '{y}' AS col_y, n,"
            f" round({num} / sqrt({dx} * {dy}), 6) AS corr FROM s"
        )
    return (
        f"WITH t AS (SELECT {base} FROM lineitem), s AS (SELECT "
        + ", ".join(sums)
        + " FROM t) "
        + " UNION ALL ".join(rows)
    )


@register(
    "q_agg_corr_matrix",
    oracle=_corr_oracle_sql(),
    origin="LLM",
    doc="Pairwise Pearson correlation matrix over the numeric lineitem "
        "features (quantity, price, discount, tax) — the feature-"
        "redundancy scan an ML pipeline runs before training. ONE "
        "map-side-combined pass computes every per-column sum, square "
        "sum, and the 6 cross-products (15 exact BIGINT aggregates "
        "total); the correlations are derived on the 1-row result via "
        "the exact-integer moment identity (n*Sxy - Sx*Sy) / "
        "sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) in DOUBLE, 6-dp rounded. "
        "Shuffle is one row per partition regardless of data size — the "
        "same plan at 100 TB; adding a feature adds aggregates, never "
        "passes.",
)
def q_agg_corr_matrix(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    cols = {
        "qty": F.round(F.col("l_quantity")).cast("long"),
        "price": F.round(F.col("l_extendedprice")).cast("long"),
        "disc": F.round(F.col("l_discount") * 100).cast("long"),
        "tax": F.round(F.col("l_tax") * 100).cast("long"),
    }
    t = li.select(*[c.alias(n) for n, c in cols.items()])
    # Moment aggregates and the correlation fold are built as SQL strings
    # parsed JVM-side (guide §5 driver overhead): the equivalent
    # Column-API loops cost ~3,300 py4j round-trips (~0.4 s of serial
    # driver time per invocation) constructing the identical tree.
    aggs = [F.expr("count(1) AS n")]
    for name in cols:
        aggs.append(F.expr(f"sum({name}) AS s_{name}"))
        aggs.append(F.expr(f"sum({name} * {name}) AS ss_{name}"))
    for x, y in _CORR_PAIRS:
        aggs.append(F.expr(f"sum({x} * {y}) AS sp_{x}_{y}"))
    s = t.agg(*aggs)

    def _d(c):  # exact-integer sum -> DOUBLE, once, like the oracle
        return f"CAST({c} AS DOUBLE)"

    pair_structs = []
    for x, y in _CORR_PAIRS:
        num = f"{_d('n')} * {_d(f'sp_{x}_{y}')} - {_d(f's_{x}')} * {_d(f's_{y}')}"
        dx = f"{_d('n')} * {_d(f'ss_{x}')} - {_d(f's_{x}')} * {_d(f's_{x}')}"
        dy = f"{_d('n')} * {_d(f'ss_{y}')} - {_d(f's_{y}')} * {_d(f's_{y}')}"
        pair_structs.append(
            f"named_struct('col_x', '{x}', 'col_y', '{y}', 'corr',"
            f" round(({num}) / sqrt(({dx}) * ({dy})), 6))"
        )
    return s.select(
        F.col("n"),
        F.expr(f"explode(array({', '.join(pair_structs)}))").alias("p"),
    ).select("p.col_x", "p.col_y", "n", "p.corr")
