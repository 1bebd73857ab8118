"""Paired per-key timing: Spark engine vs DuckDB oracle, min-of-3.

Usage: python tools/time_keys.py q_text_dsir q_ppl_bucket ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Same estimator as bench.py / tools/measure_baseline.py (1 warmup + min of
3, fully fetched) so numbers are directly comparable to the committed
BENCH_local / BASE_local artifacts. One JSON line per key on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_local import connect_duckdb  # noqa: E402
from xml_processor_spark.registry import get_oracles, get_queries  # noqa: E402
from xml_processor_spark.session import build_session  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        print("usage: time_keys.py KEY [KEY ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("time_keys")
    queries = get_queries()
    oracles = get_oracles()
    con = connect_duckdb(sf_dir)
    for key in keys:
        fn = queries[key]
        # toPandas(), NOT collect(): the r14 drift investigation found this
        # tool timing pickle row deserialization on large results (a 600k-row
        # key measured 3.5 s here vs 1.7 s in bench.py, identical plan) —
        # bench.py's docstring already documents the 6x collect() tax. Arrow
        # materialization is the estimator the committed artifacts use.
        fn(spark, sf_dir).toPandas()  # warmup (also triggers caches/JIT)
        s_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            s_runs.append(time.perf_counter() - t0)
        d_best = None
        if key in oracles:
            sql = oracles[key]
            con.execute(sql).fetchall()
            d_runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                d_runs.append(time.perf_counter() - t0)
            d_best = round(min(d_runs), 3)
        s_best = round(min(s_runs), 3)
        ratio = round(s_best / d_best, 2) if d_best else None
        print(
            json.dumps(
                {"key": key, "spark": s_best, "duckdb": d_best, "ratio": ratio}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
