"""Capture ``.explain("formatted")`` output for registry keys to files.

Supports the optimization-round deliverable ``plans/r15/<key>_{before,after}.txt``:
run once with ``--repo`` pointed at a historical worktree (before) and once at
the live repo (after). The physical plan is captured WITHOUT executing the
query, so route choices that depend on a driver-side pre-count (the r15
posting/prefix-pair cutover) still reflect the data dir passed in ``--data``.

Usage:
    python tools/explain_plans.py --repo /root/repo --data /root/testdata/sf0.1 \
        --out plans/r15 --suffix after --keys q_dedup_containment q_dedup_degree
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo", help="repo root to import xml_processor_spark from")
    ap.add_argument("--data", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True, help="output directory for <key>_<suffix>.txt")
    ap.add_argument("--suffix", required=True, help="before|after (or any label)")
    ap.add_argument("--keys", nargs="+", required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.repo))
    from xml_processor_spark.registry import get_queries
    from xml_processor_spark.session import build_session

    os.makedirs(args.out, exist_ok=True)
    spark = build_session("explain_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    for key in args.keys:
        spark.sparkContext.setJobDescription(f"explain: {key}")
        df = queries[key](spark, args.data)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} — explain('formatted')\n")
            f.write(f"# repo={os.path.abspath(args.repo)} data={args.data}\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
