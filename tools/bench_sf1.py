"""Paired volume-key bench at the sf1-equivalent fixture (VERDICT r9 #1b).

Protocol difference from bench.py/measure_baseline.py (documented in
SF1VERIFY.md): at SF1 the volume keys run SECONDS each, so instead of two
separate full passes per engine (whose pairing the host's documented 40%
cross-window swing can skew), each key runs Spark and DuckDB BACK TO BACK
inside the same seconds-wide window — the tightest pairing available —
with 1 warmup + min-of-N (default 2) per engine per key. Only the VOLUME
subset runs (DuckDB ≥ 0.15 s at sf0.1): the micro keys are floor-bound by
construction (~0.3-0.7 s PySpark per-query constant, measured identical at
every SF) and at SF1 they would only re-measure that constant.

Usage: python tools/bench_sf1.py [--sf /tmp/xps_sf1] [--runs 2]
       [--base BASE_local_r10_sf0.1.json]
Prints one JSON line: {"queries": {key: {"spark": s, "duck": s}}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_local import connect_duckdb  # noqa: E402
from xml_processor_spark.registry import get_oracles, get_queries  # noqa: E402
from xml_processor_spark.session import build_session  # noqa: E402

VOLUME_CUTOFF = 0.15


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/xps_sf1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--base", default="BASE_local_r10_sf0.1.json",
                    help="sf0.1 DuckDB baseline JSON used to pick the "
                    "volume subset (DuckDB >= 0.15 s there)")
    ap.add_argument("--out", default="/tmp/bench_sf1_paired.json")
    ap.add_argument("--skip", nargs="*", default=[],
                    help="keys to exclude (e.g. ground-truth-replay oracles "
                    "whose DuckDB side is deliberately brute force and "
                    "runs minutes at SF1 — paired separately)")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="explicit key list — overrides the volume-subset "
                    "selection (r12: per-key watchlist pairing)")
    args = ap.parse_args()

    base = {}
    for line in open(args.base):
        line = line.strip()
        if line.startswith("{"):
            base = json.loads(line)["queries"]
            break
    volume = (
        args.keys
        if args.keys
        else sorted(k for k, v in base.items() if v >= VOLUME_CUTOFF)
    )

    queries, oracles = get_queries(), get_oracles()
    spark = build_session("bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    con = connect_duckdb(args.sf)

    import pyarrow.parquet as pq

    layout = {
        t: pq.read_metadata(os.path.join(args.sf, f"{t}.parquet")).num_row_groups
        for t in ("lineitem", "orders", "events", "documents")
        if os.path.exists(os.path.join(args.sf, f"{t}.parquet"))
    }
    out: dict[str, dict] = {}
    for key in volume:
        if key not in oracles or key in args.skip:
            continue
        fn, sql = queries[key], oracles[key]
        fn(spark, args.sf).toPandas()  # warmup
        s_runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            s_runs.append(time.perf_counter() - t0)
        con.execute(sql).fetchall()  # warmup
        d_runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_runs.append(time.perf_counter() - t0)
        out[key] = {
            "spark": round(min(s_runs), 3),
            "duck": round(min(d_runs), 3),
        }
        print(f"PAIR {key}: spark={out[key]['spark']}s "
              f"duck={out[key]['duck']}s", flush=True)
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "runs": args.runs,
                       "fixture_row_groups": layout,
                       "queries": out}, f, indent=1)

    sp = sum(v["spark"] for v in out.values())
    du = sum(v["duck"] for v in out.values())
    print(json.dumps({
        "metric": "sf1_paired_volume",
        "n": len(out),
        "spark_sec": round(sp, 1),
        "duck_sec": round(du, 1),
        "ratio": round(sp / du, 3) if du else None,
        "sf": args.sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
