"""Volume-vs-floor ratio decomposition (VERDICT r7 #7).

The headline set keeps growing, and every bounded-output micro-aggregate
added drags the published Spark/DuckDB ratio up without measuring anything
structural: PySpark pays a measured ~0.3-0.7 s per-query constant
(driver->JVM round trips, plan compile, Arrow setup) that vanishes at the
100 TB design point, while DuckDB's floor is ~0.01 s. This tool splits the
oracle-intersection ratio into:

 - VOLUME keys: DuckDB min-of-3 >= 0.15 s. DuckDB has no per-query floor
   worth naming, so its wall time is an honest proxy for "real data volume
   flows through the plan". The ratio on this subset is the number that
   predicts relative behavior at scale.
 - FLOOR-BOUND micro keys: DuckDB < 0.15 s. Dominated by the per-query
   constant on the Spark side; reported separately so the headline ratio
   stays interpretable as the set grows.

Usage:
    python bench.py > /tmp/bench.json
    python tools/measure_baseline.py > /tmp/base.json
    python tools/ratio_report.py /tmp/bench.json /tmp/base.json
"""

from __future__ import annotations

import json
import sys

VOLUME_CUTOFF_SEC = 0.15


def _queries(path: str) -> dict[str, float]:
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if "queries" in d:
                return d["queries"]
    raise SystemExit(f"no JSON line with 'queries' in {path}")


def main() -> None:
    bench, base = _queries(sys.argv[1]), _queries(sys.argv[2])
    common = sorted(set(bench) & set(base))
    vol = [k for k in common if base[k] >= VOLUME_CUTOFF_SEC]
    micro = [k for k in common if base[k] < VOLUME_CUTOFF_SEC]

    def _ratio(keys):
        s, d = sum(bench[k] for k in keys), sum(base[k] for k in keys)
        return s, d, (s / d if d else float("nan"))

    for label, keys in (("ALL", common), ("VOLUME", vol), ("MICRO", micro)):
        s, d, r = _ratio(keys)
        print(f"{label:7s} n={len(keys):3d} spark={s:7.1f}s duckdb={d:7.1f}s "
              f"ratio={r:5.2f}")
    print("\nvolume keys:", " ".join(vol))
    print("\nmicro keys:", " ".join(micro))
    worst = sorted(vol, key=lambda k: bench[k] / max(base[k], 1e-9))[-8:]
    print("\nworst volume-key ratios:")
    for k in reversed(worst):
        print(f"  {k}: {bench[k]:.2f}s / {base[k]:.2f}s = "
              f"{bench[k] / max(base[k], 1e-9):.2f}")
    fastest = sorted(vol, key=lambda k: bench[k] / max(base[k], 1e-9))[:8]
    print("\nbest volume-key ratios (Spark ahead):")
    for k in fastest:
        print(f"  {k}: {bench[k]:.2f}s / {base[k]:.2f}s = "
              f"{bench[k] / max(base[k], 1e-9):.2f}")


if __name__ == "__main__":
    main()
