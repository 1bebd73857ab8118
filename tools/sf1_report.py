"""Assemble SF1VERIFY.md result sections from the run artifacts.

Usage: python tools/sf1_report.py SF1VERIFY.json bench_sf1.json base_sf1.json
Prints the markdown blocks; paste/patch into SF1VERIFY.md.
"""

from __future__ import annotations

import json
import sys

VOLUME_CUTOFF = 0.15


def main() -> None:
    sweep = json.load(open(sys.argv[1]))
    keys = sweep["keys"]
    s = sweep["summary"]
    secs = sorted(
        ((v.get("sec") or 0, k) for k, v in keys.items()), reverse=True
    )
    total = sum(t for t, _ in secs)
    fails = [k for k, v in keys.items() if v["status"] == "fail"]
    print("### Sweep summary\n")
    print(
        f"**{s['pass']} pass, {s['rows_only']} rows-only, {s['fail']} fail "
        f"(of {s['keys_run']}; registry={s['registry']})** — total sweep "
        f"wall clock {total/60:.1f} min (Spark run + DuckDB oracle per key)."
    )
    if fails:
        print("\nFAILING:", " ".join(fails))
    print("\nSlowest 12 keys (Spark + oracle seconds at SF1):\n")
    print("| key | sec | status |")
    print("|---|---|---|")
    for t, k in secs[:12]:
        print(f"| `{k}` | {t:.1f} | {keys[k]['status']} |")

    if len(sys.argv) < 4:
        return
    bench = _queries(sys.argv[2])
    base = _queries(sys.argv[3])
    common = sorted(set(bench) & set(base))
    vol = [k for k in common if base[k] >= VOLUME_CUTOFF]
    micro = [k for k in common if base[k] < VOLUME_CUTOFF]
    print("\n### Paired bench decomposition (SF1)\n")
    print("| subset | n | Spark | DuckDB | ratio |")
    print("|---|---|---|---|---|")
    for name, ks in (("ALL intersect", common), ("VOLUME (DuckDB ≥ 0.15 s)", vol),
                     ("FLOOR-BOUND micro", micro)):
        sp = sum(bench[k] for k in ks)
        du = sum(base[k] for k in ks)
        r = sp / du if du else float("nan")
        print(f"| {name} | {len(ks)} | {sp:.1f} s | {du:.1f} s | **{r:.2f}** |")
    worst = sorted(vol, key=lambda k: -(bench[k] / base[k]))[:8]
    best = sorted(vol, key=lambda k: bench[k] / base[k])[:8]
    print("\nworst volume ratios:",
          ", ".join(f"`{k}` {bench[k]/base[k]:.2f}" for k in worst))
    print("\nbest volume ratios:",
          ", ".join(f"`{k}` {bench[k]/base[k]:.2f}" for k in best))


def _queries(path: str) -> dict[str, float]:
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if "queries" in d:
                return d["queries"]
    raise SystemExit(f"no JSON line with 'queries' in {path}")


if __name__ == "__main__":
    main()
