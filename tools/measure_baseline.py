"""Measure the DuckDB oracle baseline per headline query (BASELINE.md).

DuckDB 1.0.0, all cores, same sf as bench.py; 1 warmup + MIN of 3 (the
same noise-robust estimator bench.py uses — see its docstring for the
measured 40% host variance that motivated min over median), results fully
fetched. Prints one JSON line mirroring bench.py's shape.
Rows-only keys (no SQL oracle) are skipped — no second engine exists for
them; bench-vs-baseline comparison covers the oracle-checked headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tools.verify_local import connect_duckdb  # noqa: E402
from xml_processor_spark.registry import get_oracles  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = connect_duckdb(sf_dir)
    oracles = get_oracles()
    timings: dict[str, float] = {}
    for key in HEADLINE:
        if key not in oracles:
            continue
        sql = oracles[key]
        con.execute(sql).fetchall()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[key] = round(min(runs), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
