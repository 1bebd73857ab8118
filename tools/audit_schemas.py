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
    """Canonical type label for hash-parity purposes.

    Equivalences that cannot change a value-level hash (each backed by a
    driver verdict on record):
    - string/large_string (offset width only)
    - integer widths: both sides collect to Python int
      (q_agg_grouping_sets hash-passed CORRECTNESS_r02 with spark int32
      vs duck int64)
    - timestamp unit differences (second-truncated values) and
      tz=UTC vs tz-naive: Spark's collect in a UTC session and DuckDB's
      fetch both yield identical naive datetimes (q_join_asof hash-passed
      r01/r02 with spark timestamp[tz=UTC] vs duck naive). Any OTHER tz
      shifts the collected values → real divergence, kept in the label.
    - list/large_list of the same element type
    Everything else (decimal vs int, float vs decimal) is a real
    divergence — exactly the class that hash-failed q_xml_corrupt_route
    in round 1 (DuckDB HUGEINT → arrow decimal128 vs Spark int64).
    """
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_timestamp(t):
        tz = None if t.tz in (None, "UTC") else t.tz
        return f"timestamp[tz={tz}]"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_canon(t.value_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    queries = get_queries()
    oracles = get_oracles()
    keys = args.keys or sorted(oracles)

    spark = build_session("audit_schemas")
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
        # surface as a diff, not collapse silently.
        s_fields = sorted((f.name, _canon(f.type)) for f in s_tab.schema)
        d_fields = sorted((f.name, _canon(f.type)) for f in d_tab.schema)
        diffs = []
        if s_fields != d_fields:
            only_s = [f for f in s_fields if f not in d_fields]
            only_d = [f for f in d_fields if f not in s_fields]
            for name, tv in only_s:
                diffs.append(f"{name}: spark={tv} duck={dict(only_d).get(name)}")
            for name, tv in only_d:
                if name not in dict(only_s):
                    diffs.append(f"{name}: spark=None duck={tv}")
            if not diffs:  # duplicate-count mismatch: same set, different list
                diffs.append(f"field-list mismatch: {s_fields} vs {d_fields}")
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
