"""Synthesize the sf1-equivalent fixture: a deterministic 10x tiling of
/root/testdata/sf0.1 (VERDICT r9 next-round #1 — "plans graded at 17 MB"
was the one open scale risk; this retires it with real volume).

Design (all transforms deterministic, seed-free where possible):

 - region / nation are NOT tiled: like TPC-H, the geography dimensions are
   fixed at every scale factor, so joins against them stay broadcastable
   exactly as they would at a real SF1.
 - customer / supplier / part / orders / lineitem tile 10x with per-tile
   key offsets (stride = max(key)+1 of the base table) applied to every
   key AND every foreign key, so referential integrity holds within each
   tile and tile 0 is byte-identical to the base: any query that pins
   specific ids (probe sets, planted negatives) still finds them.
 - events tiles 10x offsetting event_id / user_id, keeping ts: the time
   range is fixed (a calendar does not grow with data volume) so
   calendar-bounded aggregations stay bounded while per-day volume grows
   10x — exactly the 100 TB shape.
 - documents tiles 10x offsetting doc_id and ROTATING each text's token
   list by 11*t positions (single-space re-join keeps n_chars exact):
   token/char statistics are preserved per tile, but shingle sets and
   exact hashes all differ, so the tiling does not plant a synthetic 90%
   duplicate rate that would quadratically blow up every dedup truth twin.
 - embeddings tiles 10x offsetting vec_id and applying a per-tile signed
   coordinate rotation (shift 11*t, sign flip on (d + t) odd): an
   orthogonal transform, so within-tile geometry (norms, pairwise cosines,
   kNN structure) is EXACTLY the base fixture's, while cross-tile pairs
   decorrelate — again avoiding a fake 10-way-duplicate corpus.

Output: $OUT (default /tmp/xps_sf1)/{table}.parquet. Idempotent: skips
generation when the output exists with the expected row counts.

Usage: python tools/make_sf1.py [--out /tmp/xps_sf1] [--tiles 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
TEXT_TRANSFORM = "rotate"

KEYED = {
    # table -> {column: stride_source_table}
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _strides(tabs: dict[str, pa.Table]) -> dict[str, int]:
    import pyarrow.compute as pc

    s: dict[str, int] = {}
    for t, key in KEY_OF.items():
        s[t] = int(pc.max(tabs[t][key]).as_py()) + 1
    s["events:user_id"] = int(pc.max(tabs["events"]["user_id"]).as_py()) + 1
    return s


def _rotate_text(text: str, t: int) -> str:
    if t == 0:
        return text
    toks = text.split(" ")
    k = (11 * t) % len(toks) if toks else 0
    out = " ".join(toks[k:] + toks[:k])
    # Tile-marker token: rotation alone collides for short/periodic token
    # sequences (11t mod len repeats across tiles), which would plant
    # accidental exact cross-tile duplicates. The marker guarantees
    # cross-tile distinctness at a ~1% length perturbation; n_chars is
    # recomputed after the transform.
    return f"{out} z{t}"


def _decimate_text(text: str, t: int) -> str:
    """REALISTIC tiling transform (--text-transform decimate): permute
    each tile's token list by a coprime-stride decimation i -> (i·s + t)
    mod n. Token MULTISET (and so token/char statistics) is preserved
    exactly like rotation, but consecutive pairs — hence 3-gram shingle
    sets — decorrelate across tiles instead of being cyclically
    preserved, so the corpus's near-dup rate stays the BASE fixture's
    (one family per planted base dup group) rather than the adversarial
    every-doc-has-9-twins structure rotation creates. Deterministic,
    seed-free."""
    if t == 0:
        return text
    import math

    toks = text.split(" ")
    n = len(toks)
    if n > 2:
        s = 2 + ((11 * t) % max(n - 2, 1))
        while math.gcd(s, n) != 1:
            s += 1
        toks = [toks[(i * s + t) % n] for i in range(n)]
    out = " ".join(toks)
    return f"{out} z{t}"


def _tile(tabs, strides, name: str, t: int) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    tab = tabs[name]
    if t == 0 and name not in ():
        base = tab
    else:
        base = tab
    cols = {}
    for field in tab.schema.names:
        col = tab[field]
        stride_src = KEYED.get(name, {}).get(field)
        if stride_src is not None and t > 0:
            col = pc.add(col, t * strides[stride_src])
        cols[field] = col
    out = pa.table(cols)

    if name == "documents" and t > 0:
        texts = out["text"].to_pylist()
        xform = _decimate_text if TEXT_TRANSFORM == "decimate" else _rotate_text
        rotated = [xform(x, t) for x in texts]
        out = out.set_column(
            out.schema.get_field_index("text"),
            "text",
            pa.array(rotated, type=pa.string()),
        )
        out = out.set_column(
            out.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array([len(x) for x in rotated], type=pa.int64()),
        )
    if name == "embeddings" and t > 0:
        embs = out["embedding"].to_pylist()
        mat = np.asarray(embs, dtype=np.float32)
        dim = mat.shape[1]
        shift = (11 * t) % dim
        mat = np.roll(mat, -shift, axis=1)
        sign = np.where((np.arange(dim) + t) % 2 == 1, -1.0, 1.0).astype(
            np.float32
        )
        mat = mat * sign[None, :]
        out = out.set_column(
            out.schema.get_field_index("embedding"),
            "embedding",
            pa.array([row for row in mat], type=pa.list_(pa.float32())),
        )
    return out


def _rows_per_group(tab: pa.Table, target_bytes: int) -> int:
    """Rows per parquet row group sized so each group holds ~target_bytes
    of in-memory Arrow data (VERDICT r14 #1: the old fixed 1M-row groups
    gave SF1 lineitem only 6 groups, capping Spark's scan parallelism at
    6 tasks and inflating the inert-twin floor — a REAL SF1 parquet has
    dozens of ~8 MB groups, and Spark's byte-range file splits then get
    one-group-or-more granularity for free). Arrow in-memory bytes
    overstate encoded parquet bytes (dictionary/RLE), so the resulting
    groups land comfortably under the HDFS-era 128 MB ceiling while
    staying big enough that metadata/footer overhead is negligible."""
    per_row = max(1, tab.nbytes // max(1, len(tab)))
    return max(4096, target_bytes // per_row)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/xps_sf1")
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument(
        "--text-transform", choices=("rotate", "decimate"), default="rotate",
        help="documents text transform per tile: 'rotate' preserves the "
        "cyclic shingle multiset (adversarially near-dup-heavy corpus); "
        "'decimate' permutes tokens by a coprime stride (realistic "
        "near-dup rate — the base fixture's planted families only)")
    ap.add_argument(
        "--row-group-bytes", type=int, default=8 << 20,
        help="target in-memory bytes per parquet row group (default 8 MiB "
        "— realistic production layout; VERDICT r14 #1). 0 restores the "
        "legacy fixed 1M-row groups for A/B comparison.")
    ap.add_argument(
        "--rows-per-group", type=int, default=0,
        help="explicit rows per row group for EVERY tiled table; "
        "overrides --row-group-bytes when > 0")
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables to emit (e.g. "
        "'documents,embeddings' for the SCALING.json growth-law fixture "
        "— the quadratic-risk keys read only those two, so a 30-40x "
        "tiling need not materialize an 18M-row lineitem)")
    args = ap.parse_args()
    global TEXT_TRANSFORM
    TEXT_TRANSFORM = args.text_transform
    os.makedirs(args.out, exist_ok=True)

    tabs = {
        name: pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        for name in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }
    strides = _strides(tabs)

    import json

    manifest_path = os.path.join(args.out, "_layout.json")
    manifest: dict[str, int] = {}
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))

    only = set(args.tables.split(",")) if args.tables else None
    for name, tab in tabs.items():
        if only is not None and name not in only:
            continue
        dst = os.path.join(args.out, f"{name}.parquet")
        want = (
            len(tab)
            if name in ("region", "nation")
            else len(tab) * args.tiles
        )
        if args.rows_per_group > 0:
            rpg = args.rows_per_group
        elif args.row_group_bytes > 0:
            rpg = _rows_per_group(tab, args.row_group_bytes)
        else:
            rpg = 1 << 20  # legacy layout
        if os.path.exists(dst):
            meta = pq.read_metadata(dst)
            # Layout is part of the fixture contract now (VERDICT r14 #1):
            # same row count but a different rows-per-group target must
            # regenerate, so A/B layout comparisons can't silently reuse
            # the other layout's file. The manifest records what was built.
            built_rpg = manifest.get(name)
            if meta.num_rows == want and (
                name in ("region", "nation") or built_rpg == rpg
            ):
                print(f"skip {name}: {meta.num_rows} rows / "
                      f"{meta.num_row_groups} row groups already present")
                continue
        if name in ("region", "nation"):
            pq.write_table(tab, dst)
            print(f"copy {name}: {len(tab)} rows (dimension, not tiled)")
            continue
        tiles = [_tile(tabs, strides, name, t) for t in range(args.tiles)]
        # combine_chunks: the parquet writer starts a new row group at
        # every Arrow chunk boundary, so a 10-chunk concat would cap the
        # layout at per-tile granularity regardless of rpg.
        merged = pa.concat_tables(tiles).combine_chunks()
        pq.write_table(merged, dst, row_group_size=rpg)
        manifest[name] = rpg
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
        ngroups = pq.read_metadata(dst).num_row_groups
        print(f"tile {name}: {len(tab)} x {args.tiles} = {len(merged)} rows "
              f"in {ngroups} row groups ({rpg} rows/group)")
    print("done:", args.out)


if __name__ == "__main__":
    main()
