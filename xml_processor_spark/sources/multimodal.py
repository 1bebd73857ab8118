"""Multimodal (binary) column handling (SURVEY §2.K, E-MULTIMODAL family).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing is real everywhere: ``binaryFile`` source, binary
expressions (``encode``/``md5``/``octet_length``) for metadata, and
Arrow-batched ``mapInPandas`` stages with stable output schemas for the
per-item feature work. Where an actual media codec would sit (image decode,
video demux) the decode is a clearly-marked deterministic stub — the
decoding libraries are not in this container; a real deployment swaps the
``*_stub`` function for PIL/ffmpeg while every schema / partitioning /
batch-shape contract stays identical. The audio path needs no stub at all:
8-bit PCM feature extraction is plain byte math and is computed for real.

Scale notes: every stage below is embarrassingly parallel over rows — no
shuffle anywhere; ``widen()`` only matters on the single-row-group local
fixtures. ``mapInPandas`` streams Arrow batches (bounded memory per task
regardless of file count), and a 1→N stage (frame sampling) grows output
cardinality without ever materializing a per-file Python list on the
driver.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from xml_processor_spark.io import table, widen
from xml_processor_spark.registry import register

_DECODE_SCHEMA = (
    "path STRING, n_bytes LONG, sha STRING, width INT, height INT, kind STRING"
)


def _decode_stub(content: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder.

    Stands in for image decode (PIL et al. unavailable here). Derives fake
    dimensions from the content hash so outputs are stable and testable.
    A real decoder raises NotImplementedError paths away; plumbing is what
    this exercises. The dimension formula works on HEX CHARACTERS of the
    digest (ord of the 1st..4th hex chars), not raw digest bytes, so the
    DuckDB oracle can recompute it with ascii(substring(sha256(...)))
    — the same cross-engine trick q_mm_meta uses.
    """
    import hashlib

    hx = hashlib.sha256(content).hexdigest()
    w = 16 + (ord(hx[0]) * 16 + ord(hx[1])) % 64
    h = 16 + (ord(hx[2]) * 16 + ord(hx[3])) % 64
    return w, h, "fake/deterministic"


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = {
            "path": [], "n_bytes": [], "sha": [],
            "width": [], "height": [], "kind": [],
        }
        for path, content in zip(pdf["path"], pdf["content"]):
            b = bytes(content)
            w, h, kind = _decode_stub(b)
            out["path"].append(os.path.basename(path))
            out["n_bytes"].append(len(b))
            out["sha"].append(hashlib.sha256(b).hexdigest())
            out["width"].append(w)
            out["height"].append(h)
            out["kind"].append(kind)
        yield pd.DataFrame(out)


@register(
    "E-MULTIMODAL",
    oracle="""
        WITH b AS (
            SELECT o_orderkey,
                   substring(repeat(CAST(o_orderkey AS VARCHAR) || ':' ||
                                    CAST(CAST(round(o_totalprice * 100)
                                              AS BIGINT) AS VARCHAR),
                                    50), 1, 997) AS blob
            FROM orders WHERE o_orderkey % 500 = 0
        ), h AS (
            SELECT o_orderkey, blob, sha256(blob) AS sha FROM b
        )
        SELECT 'blob_' || lpad(CAST(o_orderkey AS VARCHAR),
                               CAST(greatest(6, len(CAST(o_orderkey
                                    AS VARCHAR))) AS INTEGER),
                               '0') || '.bin' AS path,
               CAST(len(blob) AS BIGINT) AS n_bytes,
               sha,
               CAST(16 + (ascii(substring(sha, 1, 1)) * 16
                          + ascii(substring(sha, 2, 1))) % 64 AS INT)
                   AS width,
               CAST(16 + (ascii(substring(sha, 3, 1)) * 16
                          + ascii(substring(sha, 4, 1))) % 64 AS INT)
                   AS height,
               'fake/deterministic' AS kind
        FROM h
    """,
    origin="LLM",
    doc="binaryFile source → mapInPandas decode/feature stage: generate "
        "deterministic binary fixtures, ingest as BinaryType + metadata, "
        "run the Arrow-batched decode stub, return per-file features. "
        "Oracle-checked since r9 (VERDICT r8 #3): the fixture bytes are a "
        "pure-integer text unit (okey ':' exact-cents, repeated ×50, "
        "truncated at 997 bytes) so DuckDB reconstructs the identical "
        "bytes with repeat/substring and recomputes sha256 + the hex-char "
        "dimension formula; a hash match proves the binaryFile ingest and "
        "the Arrow decode stage read every fixture byte-exactly, once.",
)
def e_multimodal(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="multimodal_")
    # Deterministic binary fixtures derived from the orders table. The
    # driver-side collect is bounded fixture generation (|orders|/500
    # rows), not a data-plane collect; exact-cents formatting keeps the
    # unit text reproducible cross-engine (no float repr dependency).
    rows = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 500 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    for r in rows:
        blob = (f"{r.o_orderkey}:{r.cents}".encode() * 50)[:997]
        with open(os.path.join(tmp, f"blob_{r.o_orderkey:06d}.bin"), "wb") as f:
            f.write(blob)
    files = spark.read.format("binaryFile").load(tmp)
    decoded = files.select("path", "content").mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA
    )
    return decoded


# ---------------------------------------------------------------------------
# Typed metadata over an opaque binary column (oracle-checked).
# ---------------------------------------------------------------------------

@register(
    "q_mm_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(16 + (ascii(substring(md5(text), 1, 1)) * 16
                          + ascii(substring(md5(text), 2, 1))) % 64
                    AS INT) AS width,
               CAST(16 + (ascii(substring(md5(text), 3, 1)) * 16
                          + ascii(substring(md5(text), 4, 1))) % 64
                    AS INT) AS height,
               CASE ascii(substring(md5(text), 5, 1)) % 3
                    WHEN 0 THEN 'image/fake'
                    WHEN 1 THEN 'audio/fake'
                    ELSE 'video/fake' END AS kind
        FROM documents
    """,
    origin="LLM",
    doc="Typed metadata over an opaque binary column — the catalog row a "
        "multimodal lake keeps per asset: byte size, content digest, "
        "sniffed kind, digest-derived dimensions. The binary column is "
        "synthesized as encode(text) so the SAME bytes exist in both "
        "engines (DuckDB md5(VARCHAR) hashes the UTF-8 encoding, matching "
        "Spark md5(BINARY)); every expression is a JVM binary/string "
        "builtin — no Python, no shuffle, scan-parallel at any scale.",
)
def q_mm_meta(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    h = F.md5(blob)

    def _hexpair(i: int):
        return (
            F.ascii(F.substring(h, i, 1)) * F.lit(16)
            + F.ascii(F.substring(h, i + 1, 1))
        )

    return d.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        h.alias("content_md5"),
        (F.lit(16) + _hexpair(1) % 64).cast("int").alias("width"),
        (F.lit(16) + _hexpair(3) % 64).cast("int").alias("height"),
        F.when(F.ascii(F.substring(h, 5, 1)) % 3 == 0, "image/fake")
        .when(F.ascii(F.substring(h, 5, 1)) % 3 == 1, "audio/fake")
        .otherwise("video/fake")
        .alias("kind"),
    )


# ---------------------------------------------------------------------------
# Audio: real 8-bit-PCM feature extraction (no codec needed — byte math).
# ---------------------------------------------------------------------------

_PCM_RATE = 8000  # Hz; interpretation constant, not a tunable

_AUDIO_SCHEMA = (
    "doc_id LONG, n_samples LONG, duration_ms DOUBLE, rms DOUBLE, "
    "peak INT, zero_crossings LONG"
)


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "n_samples", "duration_ms", "rms", "peak",
            "zero_crossings",
        )}
        for doc_id, buf in zip(pdf["doc_id"], pdf["pcm"]):
            x = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
            x -= 128.0  # center unsigned PCM
            n = len(x)
            out["doc_id"].append(int(doc_id))
            out["n_samples"].append(n)
            out["duration_ms"].append(round(n * 1000.0 / _PCM_RATE, 6))
            out["rms"].append(
                round(float(np.sqrt(np.mean(x * x))), 6) if n else 0.0
            )
            out["peak"].append(int(np.max(np.abs(x))) if n else 0)
            out["zero_crossings"].append(
                int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if n > 1 else 0
            )
        yield pd.DataFrame(out)


@register(
    "E-MM-AUDIO",
    # Oracle-checkable (r9): the PCM fixture is encode(text,'UTF-8') and the
    # corpus is pure ASCII (octet_length == length for every doc, probed),
    # so DuckDB can re-derive every byte as ascii(substring(text,p,1)) over
    # an unnested position series. Determinism is exact-integer: the RMS
    # numerator Σ(byte-128)² is an integer < 2^53 (docs ≤ ~600 bytes ×
    # 128² per term), so numpy's pairwise sum and DuckDB's sequential sum
    # both compute it EXACTLY; the single division and sqrt are then
    # correctly-rounded IEEE ops on identical operands — bit-identical
    # before the 6-dp round, not a float truce.
    oracle=f"""
        WITH d AS (
            SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, n)) AS p
            FROM d
        ), s AS (
            SELECT doc_id,
                   ascii(substring(text, p, 1)) AS byte,
                   CASE WHEN p > 1
                        THEN ascii(substring(text, p - 1, 1)) END AS prev
            FROM pos
        ), agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   sum(CAST((byte - 128) * (byte - 128) AS BIGINT)) AS ss,
                   max(abs(byte - 128)) AS peak,
                   sum(CASE WHEN prev IS NOT NULL
                             AND (byte < 128) <> (prev < 128)
                            THEN 1 ELSE 0 END) AS zc
            FROM s GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(a.n_samples, 0) AS n_samples,
               round(CAST(d.n AS DOUBLE) * 1000.0 / {_PCM_RATE}, 6)
                   AS duration_ms,
               CASE WHEN a.n_samples IS NULL THEN 0.0
                    ELSE round(sqrt(CAST(a.ss AS DOUBLE)
                                    / CAST(a.n_samples AS DOUBLE)), 6)
               END AS rms,
               CAST(COALESCE(a.peak, 0) AS INTEGER) AS peak,
               CAST(COALESCE(a.zc, 0) AS BIGINT) AS zero_crossings
        FROM d LEFT JOIN agg a USING (doc_id)
    """,
    origin="LLM",
    doc="Audio feature extraction over a binary PCM column: duration, RMS "
        "energy, peak amplitude, zero-crossing count — computed for REAL "
        "(uint8 PCM is plain byte math; no codec library involved) in one "
        "Arrow-batched numpy pass per batch via mapInPandas. Zero shuffle; "
        "per-task memory bounded by the Arrow batch size, not file count. "
        "Oracle-checked since r9: DuckDB re-derives the byte stream from "
        "the ASCII fixture and recomputes all four features with "
        "exact-integer moments (see oracle comment); the signed-PCM "
        "zero-crossing channel (absent from ASCII, where every centered "
        "byte is negative) stays pinned by the pure-Python recompute in "
        "tests/test_multimodal.py.",
)
def e_mm_audio(spark, sf_dir):
    d = widen(table(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "UTF-8").alias("pcm")
    )
    return d.mapInPandas(_audio_batches, schema=_AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Image: decode stub → REAL average-pool resize to a fixed thumbnail.
# ---------------------------------------------------------------------------

_THUMB = 8  # output thumbnail is _THUMB x _THUMB

_IMAGE_SCHEMA = (
    "doc_id LONG, width INT, height INT, thumb_mean DOUBLE, "
    "thumb_min DOUBLE, thumb_max DOUBLE, thumb_digest STRING"
)


def _image_decode_stub(content: bytes):
    """Deterministic fake image decoder (PIL unavailable here).

    Derives (height, width) and a grayscale pixel array from the content
    hash so outputs are stable across runs/executors. A real deployment
    replaces ONLY this function with e.g. PIL.Image.open; the resize math
    and all Spark plumbing below stay identical.
    """
    import hashlib

    import numpy as np

    h = hashlib.sha256(content).digest()
    height = 16 + h[0] % 48
    width = 16 + h[1] % 48
    rng = np.random.RandomState(int.from_bytes(h[2:6], "big"))
    return rng.randint(0, 256, size=(height, width)).astype(np.float64)


def _avg_pool(img, out_h: int, out_w: int):
    """Average-pool resize to (out_h, out_w) — real image math, codec-free.

    Rows/cols are binned by integer edge arithmetic (the same grid for any
    input size >= output size), then each output cell is the mean of its
    source block. Deterministic, no interpolation-library dependency.
    """
    import numpy as np

    in_h, in_w = img.shape
    r_edges = (np.arange(out_h + 1) * in_h) // out_h
    c_edges = (np.arange(out_w + 1) * in_w) // out_w
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = img[r_edges[i]:r_edges[i + 1], c_edges[j]:c_edges[j + 1]]
            out[i, j] = block.mean()
    return out


def _image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    for pdf in batches:
        out = {
            "doc_id": [], "width": [], "height": [], "thumb_mean": [],
            "thumb_min": [], "thumb_max": [], "thumb_digest": [],
        }
        for doc_id, buf in zip(pdf["doc_id"], pdf["img"]):
            img = _image_decode_stub(bytes(buf))
            thumb = np.round(_avg_pool(img, _THUMB, _THUMB), 3)
            out["doc_id"].append(int(doc_id))
            out["height"].append(img.shape[0])
            out["width"].append(img.shape[1])
            out["thumb_mean"].append(round(float(thumb.mean()), 6))
            out["thumb_min"].append(float(thumb.min()))
            out["thumb_max"].append(float(thumb.max()))
            # Fixed-point digest of the full pixel vector: the comparator
            # can hash a string where it cannot hash array<float>. rint,
            # not truncation — astype alone maps 0.153*1000 = 152.999…
            # to 152, colliding with 0.152 (ADVICE r5); rounding pins
            # every 3-dp pooled pixel value uniquely.
            fixed = np.rint(thumb.ravel() * 1000).astype(np.int64)
            out["thumb_digest"].append(
                hashlib.md5(fixed.tobytes()).hexdigest()
            )
        yield pd.DataFrame(out)


@register(
    "E-MM-IMAGE",
    oracle=None,
    origin="LLM",
    doc="Image resize/feature stage: binary column → decode (deterministic "
        "stub standing in for PIL — clearly marked, swap-in point) → REAL "
        f"average-pool resize to a fixed {_THUMB}x{_THUMB} float thumbnail "
        "via mapInPandas, surfaced as scalar stats + a fixed-point digest "
        "of the pooled pixels (the comparator cannot hash array<float>); "
        "zero shuffle.",
)
def e_mm_image(spark, sf_dir):
    d = widen(table(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "UTF-8").alias("img")
    )
    return d.mapInPandas(_image_batches, schema=_IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: frame sampling — a 1→N mapInPandas stage.
# ---------------------------------------------------------------------------

_FRAME_STRIDE = 30  # sample every 30th frame ("1 fps at 30fps")

_FRAMES_SCHEMA = "doc_id LONG, n_frames INT, frame_idx INT, frame_md5 STRING"


def _frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "n_frames": [], "frame_idx": [], "frame_md5": []}
        for doc_id, buf in zip(pdf["doc_id"], pdf["video"]):
            b = bytes(buf)
            # Demux stub: frame count derived from the byte length (a real
            # demuxer reads the container header here — swap-in point).
            n_frames = 1 + len(b) % 240
            sig = hashlib.sha256(b).hexdigest()
            for idx in range(0, n_frames, _FRAME_STRIDE):
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(n_frames)
                out["frame_idx"].append(idx)
                out["frame_md5"].append(
                    hashlib.md5(f"{sig}:{idx}".encode()).hexdigest()
                )
        yield pd.DataFrame(out)


@register(
    "E-MM-FRAMES",
    # Oracle-checkable (r9): the demux stub's whole output is string
    # arithmetic over sha256(content) — and DuckDB's sha256()/md5() return
    # the same lowercase hex as hashlib's hexdigest (probed), while the
    # ASCII fixture makes content == text bytes. So the oracle replays the
    # exact 1→N expansion: n_frames = 1 + length % 240, every 30th index,
    # md5('<sha256hex>:<idx>') — exact strings, no float anywhere.
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(1 + length(text) % 240 AS INTEGER) AS n_frames,
                   sha256(text) AS sig
            FROM documents
        ), f AS (
            SELECT doc_id, n_frames, sig,
                   unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE}))
                       AS frame_idx
            FROM d
        )
        SELECT doc_id, n_frames,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(sig || ':' || CAST(frame_idx AS VARCHAR)) AS frame_md5
        FROM f
    """,
    origin="LLM",
    doc="Video frame sampling: binary column → demux stub (frame count; "
        f"swap-in point for ffmpeg) → every-{_FRAME_STRIDE}th-frame sample "
        "emitted as ROWS — a 1→N mapInPandas stage proving the cardinality-"
        "changing UDF contract (output rows are streamed per Arrow batch, "
        "never a per-file driver-side list). Zero shuffle; downstream "
        "per-frame work inherits scan parallelism. Oracle-checked since "
        "r9: DuckDB replays the sha256-derived expansion exactly (see "
        "oracle comment) — a lost/duplicated frame row, wrong stride, or "
        "drifting digest hash-mismatches.",
)
def e_mm_frames(spark, sf_dir):
    d = widen(table(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "UTF-8").alias("video")
    )
    return d.mapInPandas(_frames_batches, schema=_FRAMES_SCHEMA)
