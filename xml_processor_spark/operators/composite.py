"""Subqueries & composite analytical queries (SURVEY §2.M).

Subqueries run through ``spark.sql`` over the registered views — the SQL
entry point of SURVEY §3 — and lean on Catalyst's decorrelation rules
(``RewriteCorrelatedScalarSubquery``): a correlated scalar subquery becomes
an aggregate + join, never a per-row re-execution. The TPC-H-shaped
composites exercise multi-join pipelines end-to-end: dimension broadcast,
join ordering under AQE, and partial aggregation above the join.

Revenue sums follow the integer-cents discipline of
:mod:`xml_processor_spark.functions.deterministic`: exact, associative,
order-independent across any partitioning — the property that makes a
100 TB shuffle-reduced sum reproducible.
"""

from __future__ import annotations

from xml_processor_spark.functions.deterministic import ha_sql, ha_sql_nn
from xml_processor_spark.io import register_views
from xml_processor_spark.registry import register

# Exact revenue in 1e-4 units: price cents × discount-complement cents.
_REV_SQL = (
    "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 1e4"
)

_SUBQ_SCALAR_SQL = """
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS retail
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.04 FROM part)
"""

_SUBQ_IN_SQL = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""

_SUBQ_CORR_SQL = """
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s.s_acctbal > (SELECT avg(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
"""

_Q3_SQL = f"""
    SELECT l_orderkey,
           {_REV_SQL} AS revenue,
           min(o_orderdate) AS orderdate,
           min(o_orderpriority) AS priority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

_Q5_SQL = f"""
    SELECT n_name, {_REV_SQL} AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


_Q7_SQL = f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {_REV_SQL} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
    ORDER BY supp_nation, cust_nation, l_year
"""

_Q10_SQL = f"""
    SELECT c_custkey,
           min(c_name) AS c_name,
           min(n_name) AS n_name,
           {_REV_SQL} AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

_Q12_SQL = """
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
    GROUP BY CAST(year(l_shipdate) AS INT)
    ORDER BY ship_year
"""


_Q4_SQL = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

_Q6_SQL = """
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / 1e4 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
"""

_Q14_SQL = f"""
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)
               AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         ELSE 0 END) AS DOUBLE) / 1e4 AS promo_rev,
           {_REV_SQL} AS total_rev
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)
    ORDER BY ship_month
"""

_Q18_SQL = """
    SELECT c_custkey, min(c_name) AS c_name, o_orderkey,
           min(o_orderdate) AS orderdate,
           min(o_totalprice) AS totalprice,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 200)
    GROUP BY c_custkey, o_orderkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
"""

# Engine-side algebraic rewrite of Q18 (r15, guide §2.4 — remove shuffles
# outright; the q_tpch_q21 split-dialect precedent). The canonical form
# scans lineitem TWICE: once inside the IN-subquery's HAVING aggregate and
# once in the outer join, whose 3-table join output is then re-aggregated
# per (c_custkey, o_orderkey). But the outer GROUP BY contains o_orderkey,
# so the outer SUM(round(l_quantity)) over a group is exactly
# (join multiplicity of that (custkey, orderkey) customer x orders pair)
# x (the per-orderkey lineitem sum q) — the SAME q the HAVING already
# computed. Aggregating lineitem ONCE per l_orderkey, HAVING-filtering
# (highly selective), and joining the surviving (orderkey, q) rows
# reproduces every group bit-identically on ANY data, duplicates included:
# a group with m customer x orders row-pairs gets SUM(q) = m*q either way,
# and the inner join to the grouped lq is exactly the IN-filter (lq is
# distinct on l_orderkey by construction). No FK/PK assumption anywhere.
# Plan effect: lineitem scanned once instead of twice, the 600k-row
# fact-side join + re-aggregation is replaced by a broadcast of the
# handful of >200-quantity orderkeys — 2 fewer Exchanges, 1 fewer scan.
# Join order matters without CBO stats: lq must anchor the FROM clause so
# the selective survivors reduce orders BEFORE customer attaches
# ((customer ⋈ orders) ⋈ lq measured 3x slower at SF1 — it shuffles the
# two big tables together first; inner joins commute, result unchanged).
_Q18_ENGINE_SQL = """
    WITH lq AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 200
    )
    SELECT c_custkey, min(c_name) AS c_name, o_orderkey,
           min(o_orderdate) AS orderdate,
           min(o_totalprice) AS totalprice,
           CAST(SUM(q) AS BIGINT) AS total_qty
    FROM lq
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, o_orderkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
"""

_Q19_SQL = f"""
    SELECT {_REV_SQL} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
"""

_LATERAL_SQL = """
    SELECT n_name, c.ckey, c.bal
    FROM nation, LATERAL (
        SELECT c_custkey AS ckey, round(c_acctbal, 2) AS bal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) c
"""


def _sql_query(name: str, sql: str, doc: str, oracle: str | None = None):
    """Register a dialect-shared SQL string: the SAME text runs on Spark
    (engine under test) and DuckDB (oracle) — dual-dialect by construction.
    Pass ``oracle`` to split dialects: the engine runs ``sql`` while the
    oracle runs an INDEPENDENT formulation of the same result (a stronger
    check than replaying identical text — used by q_tpch_q21, whose
    engine side is algebraically rewritten while the oracle keeps the
    canonical TPC-H subquery form)."""

    @register(name, oracle=oracle or sql, doc=doc)
    def _run(spark, sf_dir, _sql=sql):
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    return _run


_sql_query(
    "q_subq_scalar",
    _SUBQ_SCALAR_SQL,
    "Uncorrelated scalar subquery: parts priced >1.04x the global average. "
    "Catalyst plans the subquery once (broadcast scalar), not per row.",
)

_sql_query(
    "q_subq_in",
    _SUBQ_IN_SQL,
    "IN-subquery: customers with a pending order — rewritten to a "
    "left-semi hash join by Catalyst (same plan as q_join_semi).",
)

_sql_query(
    "q_subq_corr",
    _SUBQ_CORR_SQL,
    "Correlated scalar subquery: suppliers above their nation's average "
    "balance. Decorrelated into (aggregate ⋈ supplier) — one pass over "
    "supplier, no per-row re-execution (RewriteCorrelatedScalarSubquery).",
)

_sql_query(
    "q_tpch_q3",
    _Q3_SQL,
    "TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, "
    "exact-cents revenue per order, global top-10 (TakeOrderedAndProject "
    "— no full sort). Dimension side broadcasts under AQE.",
)

_sql_query(
    "q_lateral_topn",
    _LATERAL_SQL,
    "Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 customers "
    "per nation): the SQL-standard lateral form of per-group top-k. "
    "Catalyst decorrelates it via DecorrelateInnerQuery into a windowed "
    "rank over one customer shuffle — per-row re-execution never happens "
    "(same physical shape as q_topk_per_group, so it scales identically).",
)

_sql_query(
    "q_tpch_q7",
    _Q7_SQL,
    "TPC-H Q7 shape (volume shipping): lineitem ⋈ supplier ⋈ orders ⋈ "
    "customer with nation applied TWICE under different aliases and a "
    "symmetric nation-pair predicate — exercises alias-correct join "
    "planning and exact-cents revenue per (supp, cust, year). The two "
    "nation sides broadcast; the fact-side joins shuffle on their keys.",
)

_sql_query(
    "q_tpch_q10",
    _Q10_SQL,
    "TPC-H Q10 shape (returned-item reporting): one-quarter order window, "
    "returnflag-filtered lineitem, revenue per customer, global top-20 "
    "(TakeOrderedAndProject). Group keys carry min()-pinned attributes "
    "instead of a wide GROUP BY — one shuffle on c_custkey only.",
)

_sql_query(
    "q_tpch_q12",
    _Q12_SQL,
    "TPC-H Q12 shape adapted to the fixture's columns (no shipmode/"
    "receiptdate): late shipments (>90 days after order date) bucketed by "
    "ship year with a two-way priority CASE pivot. Integer sums CAST to "
    "BIGINT on both engines (the r1 HUGEINT lesson).",
)

_sql_query(
    "q_tpch_q4",
    _Q4_SQL,
    "TPC-H Q4 shape adapted to the fixture (no commit/receipt dates): "
    "orders in a one-quarter window having at least one line shipped "
    ">=60 days after the order date, counted per priority. The "
    "correlated EXISTS (with a non-equi outer reference) is rewritten by "
    "Catalyst to a left-semi hash join on l_orderkey — one shuffle, no "
    "per-row subquery execution.",
)

_sql_query(
    "q_tpch_q6",
    _Q6_SQL,
    "TPC-H Q6 shape (forecasting revenue change): tight scan-side filter "
    "(date window + discount band + quantity cap) then a single exact-"
    "cents product sum. The discount band compares integer cents — a "
    "double BETWEEN 0.05 AND 0.07 is representation-dependent. All "
    "predicates push to the parquet scan; the aggregate is one partial-"
    "final pair with no group keys — the minimal-shuffle TPC-H query.",
)

_sql_query(
    "q_tpch_q14",
    _Q14_SQL,
    "TPC-H Q14 shape (promotion effect): lineitem ⋈ part (part side "
    "broadcasts under AQE), CASE-split exact-cents revenue per ship "
    "month. promo_rev/total_rev are both emitted exactly rather than as "
    "a rounded percentage — the ratio is derivable and the hash stays "
    "representation-exact.",
)

_sql_query(
    "q_tpch_q18",
    _Q18_ENGINE_SQL,
    "TPC-H Q18 shape (large-volume customers): the oracle keeps the "
    "canonical IN-subquery form (groupBy-HAVING on lineitem, then "
    "customer ⋈ orders ⋈ lineitem re-aggregated per (custkey, orderkey) "
    "with a total-ordered top-100); the engine runs the single-scan "
    "algebraic rewrite (see _Q18_ENGINE_SQL — the per-orderkey HAVING "
    "aggregate IS the outer group's quantity sum, so lineitem is "
    "aggregated once and only the >200 survivors join). Quantity sums "
    "ride BIGINT (exact; DuckDB HUGEINT cast down).",
    oracle=_Q18_SQL,
)

_sql_query(
    "q_tpch_q19",
    _Q19_SQL,
    "TPC-H Q19 shape (discounted revenue, OR-of-conjuncts): three "
    "(brand, size-range, quantity-range) disjuncts across the join — the "
    "classic test that the planner keeps the p_partkey equi-join hashable "
    "and evaluates the disjunction as a post-join filter instead of "
    "falling back to a nested-loop cross product. Single-row exact-cents "
    "result.",
)

_sql_query(
    "q_tpch_q5",
    _Q5_SQL,
    "TPC-H Q5 shape: six-table join (region→nation→customer→orders→"
    "lineitem→supplier with the colocated-nation condition), exact-cents "
    "revenue per nation. The join tree is declared flat; AQE + CBO pick "
    "broadcast vs shuffle per edge.",
)


_Q8_SQL = """
    WITH allrev AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               n2.n_name AS supp_nation,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
                AS DOUBLE)
               / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
           CAST(SUM(rev) AS DOUBLE) / 1e4 AS total_rev
    FROM allrev
    GROUP BY o_year
    ORDER BY o_year
"""

_Q9_SQL = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    - CAST(round(p_retailprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT) * 100)
                AS DOUBLE) / 1e4 AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    ORDER BY nation, o_year
"""

_Q13_SQL = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev AS DOUBLE) / 1e4 AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
"""

_Q17_SQL = """
    WITH pq AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS cq
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 1e2 AS small_qty_rev,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(round(l_quantity) AS BIGINT) * 5 * cq < sq
"""

# Q21 algebraic rewrite (r12, single aggregate; r13, single PASS): the
# classic EXISTS/NOT-EXISTS formulation scans lineitem three times (base
# + a semi join + an anti join, each shuffling on l_orderkey). Both
# subqueries only ask per-ORDER questions — "does another supplier
# appear" ⟺ countDistinct(supplier) >= 2, and "is no other supplier
# late" ⟺ the late line's supplier is the order's ONLY distinct late
# supplier — so ONE per-order aggregate over the F-status lines answers
# both. r13 closes the remaining double-evaluation (VERDICT r12 #4): the
# r12 form still referenced `fl` twice (ostat + the late-line join), and
# Spark inlines CTEs, so the lineitem⋈orders join ran twice. The
# aggregate itself already knows everything the second reference
# provided: when exactly one distinct late supplier exists, EVERY late
# line of the order belongs to it, so numwait = sum of per-order late-
# line counts grouped by that supplier (a supplier with two late lines
# in one order counts twice, exactly as the l1-row count did) — the
# lineitem⋈orders pass evaluates ONCE. And both count-distincts reduce
# to min/max algebra (count(DISTINCT s) >= 2 ⟺ min(s) <> max(s);
# exactly-one-distinct-late ⟺ min_late = max_late, NULL-rejecting when
# no late line exists), so the per-order aggregate carries NO distinct
# aggregate at all — no Expand, no row triplication, one hash aggregate
# on one l_orderkey shuffle (the r13 count-distinct form measured SLOWER
# than r12 because Expand tripled the shuffled rows).
# The ORACLE deliberately keeps the canonical subquery formulation
# (_Q21_ORACLE_SQL below): two independent derivations of the same
# result agreeing on the hash is a stronger check than one text run
# twice. Equality of the two formulations is additionally pinned by
# tests/test_units.py::test_q21_rewrite_equals_exists_formulation.
_Q21_SQL = """
    WITH fl AS (
        SELECT l_orderkey, l_suppkey,
               (l_shipdate >= o_orderdate + INTERVAL 30 DAY) AS is_late
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ), ostat AS (
        SELECT l_orderkey,
               min(l_suppkey) AS min_s,
               max(l_suppkey) AS max_s,
               min(CASE WHEN is_late THEN l_suppkey END) AS min_late,
               max(CASE WHEN is_late THEN l_suppkey END) AS max_late,
               count(*) FILTER (WHERE is_late) AS n_late_lines
        FROM fl
        GROUP BY l_orderkey
    )
    SELECT s_suppkey, min(s_name) AS s_name,
           CAST(SUM(n_late_lines) AS BIGINT) AS numwait
    FROM ostat
    JOIN supplier ON s_suppkey = min_late
    WHERE min_s <> max_s AND min_late = max_late
    GROUP BY s_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 50
"""

# Canonical TPC-H Q21 subquery formulation — the ORACLE side (independent
# derivation; see the rewrite note above _Q21_SQL).
_Q21_ORACLE_SQL = """
    SELECT s_suppkey, min(s_name) AS s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >= o3.o_orderdate
                            + INTERVAL 30 DAY)
    GROUP BY s_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 50
"""

_Q22_SQL = """
    SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 1e2 AS totacctbal
    FROM customer
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
          (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
           FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY CAST(c_nationkey % 5 AS INT)
    ORDER BY cntrycode
"""


_sql_query(
    "q_tpch_q8",
    _Q8_SQL,
    "TPC-H Q8 shape (national market share): eight-way join fanning out "
    "from lineitem to part/orders/customer/nation/region on the demand "
    "side and supplier/nation on the supply side, then a CASE-split "
    "share-of-revenue ratio per order year. All dimension edges are "
    "broadcast-sized; the ratio divides two exact integer-cents sums so "
    "the double is bit-identical on both engines.",
)

_sql_query(
    "q_tpch_q9",
    _Q9_SQL,
    "TPC-H Q9 shape (product-type profit) adapted to the fixture (no "
    "partsupp: p_retailprice stands in for ps_supplycost): profit = "
    "revenue minus cost per supplier-nation x order-year, over a "
    "p_name LIKE filter. Entirely integer arithmetic until the final "
    "display division; one shuffle on the (nation, year) group keys.",
)

_sql_query(
    "q_tpch_q13",
    _Q13_SQL,
    "TPC-H Q13 shape (customer distribution): LEFT JOIN with an ON-clause "
    "filter (customers keep their row when no qualifying order exists), "
    "count per customer, then a distribution over the counts. Two "
    "cascaded aggregations — the second input is |distinct counts| rows, "
    "so the heavy shuffle happens exactly once on c_custkey.",
)

_sql_query(
    "q_tpch_q15",
    _Q15_SQL,
    "TPC-H Q15 shape (top supplier): quarter-windowed revenue per "
    "supplier in a CTE, max-revenue supplier(s) selected via an "
    "uncorrelated scalar subquery over the same CTE. Integer-cents "
    "revenue makes the max and the equality comparison exact — no "
    "double-rounding ties. The CTE is planned once under CTE reuse.",
)

_sql_query(
    "q_tpch_q17",
    _Q17_SQL,
    "TPC-H Q17 shape (small-quantity revenue): the correlated "
    "'quantity < 0.2 * per-part average' predicate is algebraically "
    "rewritten to the integer-exact 5*qty*cnt < sum form against a "
    "pre-aggregated per-part CTE — same semantics, no double-precision "
    "boundary risk, and the scale-safe plan (one aggregate + equi-join, "
    "never a per-row subquery).",
)

_sql_query(
    "q_tpch_q21",
    _Q21_SQL,
    "TPC-H Q21 shape (suppliers who kept orders waiting): late line per "
    "supplier on finalized orders, another supplier present on the same "
    "order, no OTHER supplier late. r12 algebraic rewrite + r13 "
    "single-pass fold (see _Q21_SQL comment): both existence subqueries "
    "fold into one per-order distinct-supplier aggregate, and numwait "
    "derives from the aggregate alone (late_supp + n_late_lines) — the "
    "lineitem JOIN orders pass evaluates ONCE (r11 three scans, r12 "
    "two, r13 one). The ORACLE keeps the canonical subquery "
    "formulation: two independent derivations agreeing on the value "
    "hash is a stronger check than one text run twice (their equality "
    "is also pytest-pinned). Plan test pins no-semi/anti-join, single "
    "Expand aggregate, ONE lineitem scan. Total-ordered top-50.",
    oracle=_Q21_ORACLE_SQL,
)

_sql_query(
    "q_tpch_q22",
    _Q22_SQL,
    "TPC-H Q22 shape (global sales opportunity) adapted to the fixture "
    "(nationkey residue stands in for phone country codes; every fixture "
    "customer has orders, so the anti-join excludes URGENT-order holders): "
    "customers above the positive-balance average (exact integer cents) "
    "with no urgent orders, grouped by country code. The "
    "scalar average broadcasts; NOT EXISTS becomes a left-anti hash "
    "join on o_custkey.",
)


_Q20_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 50)
    ORDER BY s_suppkey
"""

_sql_query(
    "q_tpch_q20",
    _Q20_SQL,
    "TPC-H Q20 shape (potential part promotion) adapted to the fixture "
    "(no partsupp: the availability threshold becomes a shipped-quantity "
    "threshold per (supplier, part)): nation-filtered suppliers semi-"
    "joined against a grouped-HAVING subquery over the red-part lines of "
    "one year. The IN over an aggregate output keeps Q20's signature "
    "nesting; Catalyst plans it as aggregate -> semi hash join, never "
    "per-row.",
)


# The fixture has no partsupp table; Q2/Q11/Q16 are adapted over a de facto
# partsupp derived from lineitem: the distinct (partkey, suppkey) pairs that
# actually traded, with min observed unit price (integer cents) standing in
# for ps_supplycost and summed shipped quantity for ps_availqty. The CTE is
# |distinct pairs| rows — partsupp-sized, so every plan below keeps the
# original query's scale shape (dimension joins broadcast, the one heavy
# aggregate shuffles on the pair key exactly once).
_PS_CTE = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(min(round(l_extendedprice * 100 / l_quantity)) AS BIGINT)
               AS ps_supplycost_c,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS ps_availqty
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
"""


# Shared single definition in functions/deterministic.py (ADVICE r13);
# engine-dialect only — oracles keep round().
_ha_sql = ha_sql


# Engine-side twin of _PS_CTE (r13): same grouping, half-away arithmetic
# rounds instead of round(). The per-row pre-projection keeps each ha()
# input evaluated once before the aggregate.
_PS_CTE_ENGINE = f"""
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(min(unit_c) AS BIGINT) AS ps_supplycost_c,
           CAST(SUM(q) AS BIGINT) AS ps_availqty
    FROM (
        SELECT l_partkey, l_suppkey,
               {_ha_sql('l_extendedprice * 100 / l_quantity')} AS unit_c,
               CAST({_ha_sql('l_quantity')} AS BIGINT) AS q
        FROM lineitem
        WHERE l_quantity > 0
    )
    GROUP BY l_partkey, l_suppkey
"""

_Q2_SQL = f"""
    WITH ps AS ({_PS_CTE}),
    costs AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost_c
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, s_suppkey,
           CAST(c.ps_supplycost_c AS DOUBLE) / 1e2 AS supplycost
    FROM part
    JOIN costs c ON c.ps_partkey = p_partkey
    JOIN supplier ON s_suppkey = c.ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 15
      AND p_type LIKE 'PROMO%'
      AND c.ps_supplycost_c = (SELECT min(c2.ps_supplycost_c) FROM costs c2
                               WHERE c2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
"""

# Engine dialect (r14): three structural moves vs the canonical oracle,
# all plan-motivated (the SF1 executed plan showed the lineitem pipeline
# running TWICE and a 6M-row SortMergeJoin exchange):
# 1. The ASIA-supplier and part filters push BELOW the (partkey, suppkey)
#    pair aggregate as semi joins on the group keys. Valid because both
#    filters are functions of the GROUP KEYS alone: dropping a filtered
#    supplier's/part's rows removes whole groups, never a row of a
#    surviving group, so min(unit_c) per surviving pair is unchanged.
#    Catalyst does not push joins through aggregates itself.
# 2. The correlated min-cost subquery becomes a window min over the pair
#    aggregate (ties kept by the = predicate either way) — the canonical
#    form re-evaluated the ENTIRE lineitem pipeline for the subquery
#    branch (no exchange reuse: the two branches aggregate differently).
# 3. The supplier semi-join's right side is a join-free nested-IN chain
#    (supplier → nation → region scalar) instead of a 3-way join:
#    Catalyst's size estimate for a join-derived subquery blocks static
#    broadcast and plans a SortMergeJoin whose exchange shuffles all of
#    lineitem; a filtered-scan subquery broadcasts statically.
# Oracle keeps the canonical join-above-aggregate correlated-subquery
# form (dialect-split, the q21 precedent); full-result equality pinned
# in tests/test_units.py.
_Q2_ENGINE_SQL = f"""
    WITH best AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost_c
        FROM (
            SELECT ps_partkey, ps_suppkey, ps_supplycost_c,
                   min(ps_supplycost_c) OVER (PARTITION BY ps_partkey)
                       AS min_c
            FROM (
                SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                       CAST(min(unit_c) AS BIGINT) AS ps_supplycost_c
                FROM (
                    SELECT l_partkey, l_suppkey,
                           {ha_sql_nn('l_extendedprice * 100 / l_quantity')}
                               AS unit_c
                    FROM lineitem
                    WHERE l_quantity > 0
                      AND l_suppkey IN (
                          SELECT s_suppkey FROM supplier
                          WHERE s_nationkey IN (
                              SELECT n_nationkey FROM nation
                              WHERE n_regionkey = (SELECT r_regionkey
                                                   FROM region
                                                   WHERE r_name = 'ASIA')))
                      AND l_partkey IN (SELECT p_partkey FROM part
                                        WHERE p_size <= 15
                                          AND p_type LIKE 'PROMO%')
                )
                GROUP BY l_partkey, l_suppkey
            )
        )
        WHERE ps_supplycost_c = min_c
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, s_suppkey,
           CAST(c.ps_supplycost_c AS DOUBLE) / 1e2 AS supplycost
    FROM part
    JOIN best c ON c.ps_partkey = p_partkey
    JOIN supplier ON s_suppkey = c.ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 15
      AND p_type LIKE 'PROMO%'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
"""

_sql_query(
    "q_tpch_q2",
    _Q2_ENGINE_SQL,
    "TPC-H Q2 shape (minimum-cost supplier) adapted to the fixture (de "
    "facto partsupp CTE; min observed unit price in integer cents stands "
    "in for ps_supplycost): region-filtered per-part supplier costs, the "
    "signature correlated min-cost scalar subquery over the SAME CTE, "
    "top-100 by balance under a total order. Catalyst decorrelates the "
    "min() subquery into an aggregate + equi-join on ps_partkey and "
    "plans the tie-broken LIMIT as TakeOrderedAndProject; integer-cents "
    "cost makes the min and the equality exact on both engines. r13: "
    "the engine swaps the ps CTE's round() for half-away arithmetic. "
    "r14: the ASIA-supplier and part predicates push below the pair "
    "aggregate as group-key semi joins (see _Q2_ENGINE_SQL comment) — "
    "the pair shuffle carries ~1% of lineitem instead of all of it; "
    "oracle keeps the canonical join-above-aggregate form "
    "(dialect-split).",
    oracle=_Q2_SQL,
)

_Q11_SQL = f"""
    WITH ps AS ({_PS_CTE}),
    natps AS (
        SELECT ps_partkey, ps_supplycost_c * ps_availqty AS value_c
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
    ),
    g AS (
        SELECT ps_partkey, CAST(SUM(value_c) AS BIGINT) AS sv_c
        FROM natps
        GROUP BY ps_partkey
    ),
    tot AS (SELECT CAST(SUM(sv_c) AS BIGINT) AS tot_c FROM g)
    SELECT ps_partkey, CAST(sv_c AS DOUBLE) / 1e2 AS value
    FROM g, tot
    WHERE CAST(sv_c AS DOUBLE) > CAST(tot_c AS DOUBLE) * 0.001
    ORDER BY value DESC, ps_partkey
"""

# Engine dialect (r14): the NATION_3 supplier filter pushes below the
# pair aggregate as a group-key semi join (the _Q2_ENGINE_SQL argument:
# the filter is a function of l_suppkey, a group key, so it removes whole
# groups only) — the pair shuffle carries 1/|nations| of lineitem. The
# supplier join above the aggregate disappears entirely (it contributed
# nothing but the filter). The threshold total folds via a window over
# the per-part aggregate — with the deeper r14 nesting the r13 tot-CTE's
# exchanges stopped being identical, so ReuseExchange no longer deduped
# them and the lineitem pipeline ran twice (plan-asserted single scan
# now); the window runs over the bounded |parts-in-nation| aggregate.
_Q11_ENGINE_SQL = f"""
    SELECT ps_partkey, CAST(sv_c AS DOUBLE) / 1e2 AS value
    FROM (
        SELECT ps_partkey, sv_c,
               CAST(SUM(sv_c) OVER () AS BIGINT) AS tot_c
        FROM (
            SELECT ps_partkey, CAST(SUM(value_c) AS BIGINT) AS sv_c
            FROM (
                SELECT l_partkey AS ps_partkey,
                       CAST(min(unit_c) AS BIGINT)
                           * CAST(SUM(q) AS BIGINT) AS value_c
                FROM (
                    SELECT l_partkey, l_suppkey,
                           {ha_sql_nn('l_extendedprice * 100 / l_quantity')}
                               AS unit_c,
                           CAST({ha_sql_nn('l_quantity')} AS BIGINT) AS q
                    FROM lineitem
                    WHERE l_quantity > 0
                      AND l_suppkey IN (
                          SELECT s_suppkey FROM supplier
                          WHERE s_nationkey = (SELECT n_nationkey
                                               FROM nation
                                               WHERE n_name = 'NATION_3'))
                )
                GROUP BY l_partkey, l_suppkey
            )
            GROUP BY ps_partkey
        )
    )
    WHERE CAST(sv_c AS DOUBLE) > CAST(tot_c AS DOUBLE) * 0.001
    ORDER BY value DESC, ps_partkey
"""

_sql_query(
    "q_tpch_q11",
    _Q11_ENGINE_SQL,
    "TPC-H Q11 shape (important stock identification) adapted to the "
    "fixture (de facto partsupp; cost x shipped-quantity stands in for "
    "cost x availqty): per-part inventory value within one nation, kept "
    "when above a fraction of the nation total. The textbook HAVING-"
    "against-scalar-subquery re-derives the whole partsupp pipeline: "
    "Spark plans a scalar subquery as a SEPARATE AdaptiveSparkPlan, so "
    "the big lineitem group-by shuffle ran TWICE with no exchange reuse "
    "across the subquery boundary (measured 2x at sf0.1). Restructured "
    "so the total folds from the per-part aggregate g via a 1-row cross "
    "join in the SAME plan — tot's partial aggregate sits above the "
    "identical g exchange, ReuseExchange dedupes it, and the threshold "
    "total = sum of group sums is the same number by associativity. "
    "Value accumulates as exact int64 (cents x quantity) well under "
    "2^53, so the explicit double casts in the comparison reproduce "
    "both engines' prior implicit promotion bit-for-bit; the 1-row tot "
    "broadcast is the house totals-fold pattern. r13: the engine swaps "
    "the ps CTE's round() for half-away arithmetic. r14: the NATION_3 "
    "predicate pushes below the pair aggregate as a group-key semi join "
    "(see _Q11_ENGINE_SQL comment) — the pair shuffle carries "
    "1/|nations| of lineitem; oracle keeps the canonical form "
    "(dialect-split).",
    oracle=_Q11_SQL,
)

_Q16_SQL = f"""
    WITH ps AS ({_PS_CTE})
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# Engine dialect (r14): q16 uses the ps CTE only as the DISTINCT
# (partkey, suppkey) pair set — the cost/availqty aggregates it computed
# were dead columns. The engine states just the distinct, and both the
# part predicate and the negative-balance supplier exclusion push below
# it as group-key semi/anti joins (functions of the group keys — whole
# groups only). Oracle keeps the canonical form (dialect-split).
_Q16_ENGINE_SQL = """
    WITH ps AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
        WHERE l_quantity > 0
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_brand <> 'Brand#45'
                              AND p_type NOT LIKE 'MEDIUM%'
                              AND p_size IN (1, 4, 7, 10, 13, 16, 19,
                                             22, 25, 49))
    )
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_sql_query(
    "q_tpch_q16",
    _Q16_ENGINE_SQL,
    "TPC-H Q16 shape (parts/supplier relationship) adapted to the fixture "
    "(de facto partsupp pairs; negative account balance stands in for the "
    "complaint-comment supplier exclusion): distinct supplier count per "
    "(brand, type, size) bucket over brand/type/size anti-filters, with "
    "the signature NOT IN subquery. s_suppkey is non-null so NOT IN is "
    "a plain left-anti hash join (no null-aware nested loop); the count-"
    "distinct shuffles once on the group keys. r14: the engine drops "
    "the ps CTE's dead cost/availqty aggregates (q16 needs only the "
    "distinct pair set) and pushes both predicates below the distinct "
    "as group-key semi/anti joins (see _Q16_ENGINE_SQL comment); "
    "oracle keeps the canonical form (dialect-split).",
    oracle=_Q16_SQL,
)

# Q1 exact-integer discipline: quantity/price/discount/tax all become
# integer centi-units before any sum, so every aggregate is an exact
# associative BIGINT reduction; the three derived averages round in
# INTEGER space (round(sum * 10^k / n), then one /10^6 — the r7
# emb-moments lesson: scale-0 rounding ties are exactly representable,
# so both engines break them identically). Largest sum term:
# price_c * (100-disc_c) * (100+tax_c) <= 1e7 * 100 * 108 ~ 1.1e11 per
# row — int64 holds ~8e7 such rows per group at the fixture price range;
# a 100 TB deployment lifts the same expression to DECIMAL(38,0).
_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty_c) AS DOUBLE) / 100 AS sum_qty,
           CAST(sum(price_c) AS DOUBLE) / 100 AS sum_base_price,
           CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 1e4
               AS sum_disc_price,
           CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE)
               / 1e6 AS sum_charge,
           round(CAST(sum(qty_c) AS DOUBLE) * 1e4 / count(*)) / 1e6
               AS avg_qty,
           round(CAST(sum(price_c) AS DOUBLE) * 1e4 / count(*)) / 1e6
               AS avg_price,
           round(CAST(sum(disc_c) AS DOUBLE) * 1e4 / count(*)) / 1e6
               AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
               CAST(round(l_tax * 100) AS BIGINT) AS tax_c
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    )
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

_sql_query(
    "q_tpch_q1",
    _Q1_SQL,
    "TPC-H Q1 (pricing summary report) — completes the 22-query TPC-H "
    "suite: the canonical full-scan aggregation, one shipdate filter "
    "(pushed to the parquet scan) then eight aggregates over two "
    "low-cardinality group keys. All sums are exact BIGINT centi-unit "
    "reductions and the averages round in integer space (see _Q1_SQL "
    "comment), so the result is bit-identical on any engine or "
    "partitioning. Scale shape: the defining TPC-H stress of partial "
    "aggregation — 6 output groups mean map-side combine reduces "
    "~100% of rows before the one tiny shuffle; at 100 TB the plan is "
    "scan-bound, exactly as it should be.",
)
