"""Arrow-schema parity audit (VERDICT r1 'What's wrong' #2).

The driver's correctness hash is type-sensitive: DuckDB widens integer
sums to HUGEINT (arrow decimal128(38,0)) while Spark returns LONG, so a
value-identical result can still hash-fail (q_xml_corrupt_route, r1).
This tool runs every oracle key at a small sf and compares the **Arrow
schema** of both result sets, field-by-field after sorting columns by
name — catching the whole type-widening class locally before the driver
does.

Usage:
    python tools/audit_schemas.py [--sf /root/testdata/sf0.001] [key ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

from tools.verify_local import connect_duckdb  # noqa: E402
from xml_processor_spark.registry import get_oracles, get_queries  # noqa: E402
from xml_processor_spark.session import build_session  # noqa: E402


def _canon(t: pa.DataType) -> str:
    """Precise type label — width and unit are KEPT (ADVICE r3): the audit
    reports exactly what each engine produced, and only the explicitly
    verified pairs in ``_VERIFIED_EQUIV`` are allowed to differ."""
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_canon(t.value_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


# Cross-engine label pairs verified equal at the VALUE level by a driver
# hash verdict on record (unordered). Anything not listed here — e.g.
# decimal-vs-int (the r1 q_xml_corrupt_route HUGEINT fail), float32 vs
# float64, a non-UTC tz — surfaces as DIFF.
_VERIFIED_EQUIV: frozenset[frozenset[str]] = frozenset(
    {
        # offset width only — identical bytes
        frozenset({"large_string", "string"}),
        # both sides collect to exact Python ints (q_agg_grouping_sets
        # hash-passed CORRECTNESS_r02 with spark int32 vs duck int64)
        frozenset({"int32", "int64"}),
        # Spark collects tz=UTC, DuckDB naive — identical naive datetimes
        # ONLY while the Spark session runs in UTC; _assert_preconditions
        # enforces that before this pair is honored (q_join_asof
        # hash-passed r01/r02). Unit differences are NOT whitelisted.
        frozenset({"timestamp[us,tz=UTC]", "timestamp[us,tz=None]"}),
    }
)


def _equiv(a: str, b: str) -> bool:
    if a == b:
        return True
    if a.startswith("list<") and b.startswith("list<"):
        return _equiv(a[5:-1], b[5:-1])
    return frozenset({a, b}) in _VERIFIED_EQUIV


def _assert_preconditions(spark) -> None:
    """The timestamp tz equivalence is only sound in a UTC session — a
    regression here would let a real value-level shift pass silently
    (ADVICE r3), so it is asserted, not assumed."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    assert tz == "UTC", (
        f"session tz is {tz!r}, not UTC — the timestamp[tz=UTC]≡naive "
        "equivalence in _VERIFIED_EQUIV is unsound; fix the session "
        "config before trusting this audit"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    queries = get_queries()
    oracles = get_oracles()
    keys = args.keys or sorted(oracles)

    spark = build_session("audit_schemas")
    _assert_preconditions(spark)
    con = connect_duckdb(args.sf)

    n_ok = n_bad = n_skip = 0
    bad = []
    for key in keys:
        if key not in oracles:
            n_skip += 1
            print(f"  -- {key}: rows-only (no oracle)")
            continue
        try:
            s_tab = queries[key](spark, args.sf).toArrow()
            d_tab = con.execute(oracles[key]).arrow()
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            bad.append(key)
            print(f"ERR  {key}: {type(e).__name__}: {e}")
            continue
        # Sorted (name, type) lists, not dicts — a duplicate column name
        # (which the driver's sorted-by-name hash would see twice) must
        # surface as a diff, not collapse silently. Pairwise compare with
        # the verified-equivalence whitelist; any non-whitelisted pair,
        # name mismatch, or arity mismatch is a DIFF.
        s_fields = sorted((f.name, _canon(f.type)) for f in s_tab.schema)
        d_fields = sorted((f.name, _canon(f.type)) for f in d_tab.schema)
        diffs = []
        if len(s_fields) != len(d_fields):
            diffs.append(f"field counts: {s_fields} vs {d_fields}")
        else:
            for (sn, st), (dn, dt) in zip(s_fields, d_fields):
                if sn != dn:
                    diffs.append(f"name: spark={sn} duck={dn}")
                elif not _equiv(st, dt):
                    diffs.append(f"{sn}: spark={st} duck={dt}")
        if diffs:
            n_bad += 1
            bad.append(key)
            print(f"DIFF {key}: " + " | ".join(diffs))
        else:
            n_ok += 1
            print(f"ok   {key}")

    print(
        f"\n== {n_ok} ok, {n_bad} divergent "
        f"(of {n_ok + n_bad} oracle-checked; {n_skip} rows-only skipped)"
    )
    if bad:
        print("divergent:", " ".join(bad))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
