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

    Equivalences that cannot change a value-level hash:
    - string/large_string (offset width only)
    - timestamp tz-naive microsecond vs nanosecond (both second-truncated
      by the determinism discipline)
    - list/large_list of the same element type
    Everything else (decimal vs int, int32 vs int64, float vs decimal)
    is a real divergence.
    """
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
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

    n_ok = n_bad = 0
    bad = []
    for key in keys:
        if key not in oracles:
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
        s_fields = {f.name: _canon(f.type) for f in s_tab.schema}
        d_fields = {f.name: _canon(f.type) for f in d_tab.schema}
        diffs = []
        for name in sorted(set(s_fields) | set(d_fields)):
            sv, dv = s_fields.get(name), d_fields.get(name)
            if sv != dv:
                diffs.append(f"{name}: spark={sv} duck={dv}")
        if diffs:
            n_bad += 1
            bad.append(key)
            print(f"DIFF {key}: " + " | ".join(diffs))
        else:
            n_ok += 1
            print(f"ok   {key}")

    print(f"\n== {n_ok} ok, {n_bad} divergent (of {len(keys)})")
    if bad:
        print("divergent:", " ".join(bad))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
