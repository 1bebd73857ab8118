"""Multimodal plumbing contracts (SURVEY §2.K E-MM-* family).

The decode/demux steps are deterministic stubs (documented swap-in points
for PIL/ffmpeg); what these tests pin down is the part that must survive a
real deployment unchanged: output schemas, Arrow batch streaming, 1→N
cardinality behavior, determinism under repartitioning, and agreement with
an independent pure-Python computation of the same feature math.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _docs_pdf(spark):
    from xml_processor_spark.io import table

    return (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_mm_audio_matches_pure_python(spark, queries):
    got = (
        queries["E-MM-AUDIO"](spark, SF_SMALL)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = _docs_pdf(spark)
    assert len(got) == len(docs)
    # Independent recomputation of the full feature set for a sample.
    merged = got.merge(docs, on="doc_id")
    for row in merged.head(25).itertuples():
        x = np.frombuffer(row.text.encode(), dtype=np.uint8).astype(np.float64)
        x -= 128.0
        assert row.n_samples == len(x)
        assert row.duration_ms == round(len(x) * 1000.0 / 8000, 6)
        assert row.rms == round(float(np.sqrt(np.mean(x * x))), 6)
        assert row.peak == int(np.max(np.abs(x)))
        assert row.zero_crossings == int(
            np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))
        )


def test_mm_image_schema_and_determinism(spark, queries):
    df = queries["E-MM-IMAGE"](spark, SF_SMALL)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "width", "height", "thumb_mean",
        "thumb_min", "thumb_max", "thumb_digest",
    ]
    # Scalar-only output: the driver's canonicalizer factorizes object
    # columns, so array<float> cells are forbidden (CORRECTNESS_r04 lesson).
    assert not [
        f.name for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    a = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    # Same result under a different partitioning (executor-placement
    # independence — the property a cluster rerun needs).
    b = (
        df.repartition(7)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == 500
    assert (16 <= a["width"]).all() and (a["width"] < 64).all()
    assert (a["thumb_min"] <= a["thumb_mean"]).all()
    assert (a["thumb_mean"] <= a["thumb_max"]).all()
    pd.testing.assert_frame_equal(a, b)


def test_mm_image_thumb_is_average_pool_of_stub(spark, queries):
    """Independent recompute of the pooled stats from first principles —
    a LOOP-based pool over the stub raster (not the vectorized bincount
    the engine uses), so an indexing bug in either cannot self-confirm."""
    import hashlib as _hl

    from xml_processor_spark.sources.multimodal import _image_decode_stub

    got = queries["E-MM-IMAGE"](spark, SF_SMALL).toPandas()
    docs = _docs_pdf(spark)
    merged = got.merge(docs, on="doc_id").head(10)
    for row in merged.itertuples():
        img = _image_decode_stub(row.text.encode())
        h, w = img.shape
        assert row.height == h and row.width == w
        sums = np.zeros((8, 8), dtype=np.int64)
        cnts = np.zeros((8, 8), dtype=np.int64)
        for r in range(h):
            for c in range(w):
                sums[(r * 8) // h, (c * 8) // w] += img[r, c]
                cnts[(r * 8) // h, (c * 8) // w] += 1
        assert (cnts > 0).all()
        ratios = sums / cnts
        assert row.thumb_mean == round(int(img.sum()) / (h * w), 6)
        assert row.thumb_min == round(float(ratios.min()), 6)
        assert row.thumb_max == round(float(ratios.max()), 6)
        parts = ":".join(
            f"{sums[i, j]}/{cnts[i, j]}"
            for i in range(8) for j in range(8)
        )
        assert row.thumb_digest == _hl.md5(parts.encode()).hexdigest()


def test_mm_frames_cardinality_and_signatures(spark, queries):
    got = (
        queries["E-MM-FRAMES"](spark, SF_SMALL)
        .toPandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    docs = _docs_pdf(spark)
    # Expected 1→N expansion, recomputed independently per document.
    expected_rows = 0
    for row in docs.itertuples():
        n_frames = 1 + len(row.text.encode()) % 240
        expected_rows += len(range(0, n_frames, 30))
    assert len(got) == expected_rows
    sample = got[got.doc_id == docs.doc_id.iloc[0]]
    text = docs.text.iloc[0]
    sig = hashlib.sha256(text.encode()).hexdigest()
    for r in sample.itertuples():
        assert r.n_frames == 1 + len(text.encode()) % 240
        assert r.frame_md5 == hashlib.md5(f"{sig}:{r.frame_idx}".encode()).hexdigest()


def test_mm_stages_have_no_shuffle(spark, queries):
    """Every multimodal stage is scan-parallel: no Exchange in the plan
    beyond the widen() repartition of the narrow local fixture."""
    for key in ("E-MM-AUDIO", "E-MM-IMAGE", "E-MM-FRAMES", "q_mm_meta"):
        df = queries[key](spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # widen() introduces one round-robin repartition on the single-row-
        # group fixture; hash/range exchanges would mean a real shuffle.
        assert "hashpartitioning" not in plan.lower(), f"{key}: {plan}"
        assert "rangepartitioning" not in plan.lower(), f"{key}: {plan}"


def test_shard_write_matches_manifest(spark, queries):
    """E-SHARD-WRITE's re-read-from-disk manifest must equal
    q_shard_assign's computed manifest: the partitioned write is lossless,
    the partition column round-trips, and both cover all 16 shards."""
    manifest = (
        queries["q_shard_assign"](spark, SF_SMALL)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    written = (
        queries["E-SHARD-WRITE"](spark, SF_SMALL)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert len(manifest) == 16
    pd.testing.assert_frame_equal(manifest, written, check_dtype=False)
