"""Determinism helpers shared by every query (SURVEY §2 preamble, §7).

Cross-engine hash-equality rules encoded once:

- **Sums of doubles are order-dependent** → sum in fixed-point decimal
  (exact, associative) and cast the result back to double. Both dialects use
  the same scale so results are bit-identical regardless of partitioning.
- **Averages / higher moments** → round to 6 decimal places (the residual
  error of order-permuted double addition is ~1e-10 relative; 6 dp absorbs
  it at the magnitudes in this schema).
- **Timestamps** → truncate to seconds (files mix ns/ms precision; Spark
  reads µs — FIXTURES.md precision trap).
- **Any ranked/limited output** → total order with unique-key tie-breakers,
  appended by the caller; ``collect_list`` always inside ``sort_array``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 price sums (~1e9) at scale 4 without overflow.
_DEC = "decimal(30,4)"


def dsum(col: Column | str) -> Column:
    """Order-independent (exact decimal) sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"


def cents(col: Column | str) -> Column:
    """A 2-dp currency/ratio double as an exact integer of hundredths.

    Rounding to a whole integer is cross-engine safe (the binary double sits
    ~1e-9 from the true 2-dp value, nowhere near a .5 tie); rounding a
    *product* of doubles to 4 dp is NOT (Spark rounds the shortest-string
    decimal repr, DuckDB the exact binary value — they disagree on ties).
    All derived-price sums therefore go through integer-cents arithmetic.

    r13: routes through half_away_long — bit-equal to both F.round(v, 0)
    and DuckDB's scale-0 round on every double (pinned by
    tests/test_units.py's hostile-double probe) but pure codegen
    arithmetic; F.round's BigDecimal.valueOf → Double.toString path
    measured as the dominant per-row cost across the SF1 commerce suite.
    """
    c = F.col(col) if isinstance(col, str) else col
    return half_away_long(c * 100)


def cents_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`cents`."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def half_away_long(col: Column) -> Column:
    """Whole-integer half-away-from-zero round of a double, as codegen-only
    arithmetic: sign(v)·(floor(|v|) + [|v| − floor(|v|) ≥ 0.5]).

    Bit-equal to DuckDB's scale-0 round() (std::round — half-away on the
    double value) for every |v| < 2^52: |v| − floor(|v|) is EXACT there
    (Sterbenz-adjacent: both operands share the exponent range and the
    difference needs no extra precision), so the ≥ 0.5 test reads the true
    fractional part — unlike the tempting floor(|v| + 0.5), whose inexact
    +0.5 rounds UP across a binade for values half-an-ulp below a k.5
    boundary (caught by tests/test_units.py's hostile-double pin). Spark's
    own F.round(v, 0) agrees everywhere too (its BigDecimal shortest-repr
    path can only diverge from value-rounding across a k.5 boundary, which
    forces v == k.5 exactly — where both round away from zero) — but
    F.round routes every row through BigDecimal.valueOf → Double.toString,
    which measured as the dominant per-row cost in the SF1 elasticity
    profile (r13). Use this in fact-table hot paths; keep F.round for
    driver-side/few-row surfaces."""
    a = F.abs(col)
    fl = F.floor(a)  # LONG in Spark SQL
    up = F.when(a - fl.cast("double") >= 0.5, F.lit(1)).otherwise(F.lit(0))
    return (F.signum(col).cast("long") * (fl + up)).cast("long")


def ha_sql(v: str) -> str:
    """Spark-dialect SQL-string twin of :func:`half_away_long` — half-away
    whole-integer round as FLOOR plus the exact fractional-part test, pure
    codegen arithmetic. Bit-equal to round(v) on every double (|v| < 2^52;
    the fraction compare is exact — see the half_away_long docstring), but
    avoids Spark SQL round()'s BigDecimal.valueOf → Double.toString per-row
    path, which measured as the dominant per-row cost of the
    de-facto-partsupp CTE at SF1 (r13). Engine F.expr/SQL sites only —
    oracles keep round(); the two forms' equality is pinned in DuckDB by
    tests/test_units.py. Single definition (ADVICE r13): composite.py and
    commerce.py import this instead of carrying byte-identical copies."""
    a = f"ABS({v})"
    return (
        f"((CASE WHEN ({v}) < 0 THEN -1 ELSE 1 END) * "
        f"(FLOOR({a}) + (CASE WHEN {a} - FLOOR({a}) >= CAST(0.5 AS DOUBLE) "
        f"THEN 1 ELSE 0 END)))"
    )


def py_half_away(v: float) -> int:
    """Driver-side Python twin of :func:`half_away_long` — exact
    fractional-part test, NOT floor(|v| + 0.5): the inexact +0.5 rounds up
    across a binade for values half-an-ulp below a k.5 boundary (the
    half_away_long docstring proves it; ADVICE r13 flagged the three
    floor(+0.5) driver helpers). Used to fixed-point driver-computed
    literals (log tables, DSIR ratios) so they match the DuckDB oracle's
    value-based round() on every double."""
    av = abs(v)
    f = math.floor(av)
    return int(math.copysign(f + (1 if av - f >= 0.5 else 0), v))


def half_away_long_nn(col: Column) -> Column:
    """:func:`half_away_long` for PROVABLY NON-NEGATIVE inputs (prices,
    discounts, quantities — schema contract): identical output for every
    v >= 0, but drops the signum/abs ops. FLOOR + the same exact
    fractional-part test, pure codegen. Measured on the SF1 commerce hot
    paths (r14): the sign plumbing was ~1/3 of the half-away cost at the
    fixture's 6-row-group scan parallelism ceiling. Callers must
    guarantee v >= 0 (a negative input would floor toward -inf instead
    of rounding away from zero)."""
    fl = F.floor(col)  # LONG in Spark SQL
    return (
        fl + F.when(col - fl.cast("double") >= 0.5, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")


def ha_sql_nn(v: str) -> str:
    """SQL-string twin of :func:`half_away_long_nn` — engine dialect
    only; oracles keep round(). Caller guarantees ``v`` >= 0."""
    return (
        f"(FLOOR({v}) + (CASE WHEN ({v}) - FLOOR({v}) >= "
        f"CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END))"
    )


def cents_nn(col: Column | str) -> Column:
    """:func:`cents` for non-negative currency columns (the lineitem /
    orders price and discount fields — never negative by schema): same
    exact integer-hundredths result through half_away_long_nn."""
    c = F.col(col) if isinstance(col, str) else col
    return half_away_long_nn(c * 100)


def r6(col: Column) -> Column:
    """Round to 6 dp — for avg/stddev/corr and similarity scores."""
    return F.round(col, 6)


def r2(col: Column) -> Column:
    return F.round(col, 2)


def phash60(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, as BIGINT.

    Spark's xxhash64 has no DuckDB twin; md5 is bit-identical in both
    engines, so this is the cross-engine deterministic hash family for
    SimHash / fingerprinting oracles (60 bits < 2^63: no sign issues).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def ts_sec(col: Column | str) -> Column:
    """Truncate a timestamp to whole seconds (oracle-comparable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("second", c)
