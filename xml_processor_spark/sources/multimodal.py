"""Multimodal (binary) column handling (SURVEY §2.K E-MULTIMODAL).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing is real: ``binaryFile`` source, content hashing,
Arrow-batched ``mapInPandas`` decode stage with a stable output schema.
The decode itself is a clearly-marked deterministic stub — the decoding
libraries are not in this container; a real deployment swaps `_decode_stub`
for PIL/ffmpeg while every schema/partitioning contract stays identical.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_DECODE_SCHEMA = (
    "path STRING, n_bytes LONG, sha STRING, width INT, height INT, kind STRING"
)


def _decode_stub(content: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder.

    Stands in for image decode (PIL et al. unavailable here). Derives fake
    dimensions from the content hash so outputs are stable and testable.
    A real decoder raises NotImplementedError paths away; plumbing is what
    this exercises.
    """
    import hashlib

    h = hashlib.sha256(content).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, "fake/deterministic"


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
    oracle=None,
    origin="LLM",
    doc="binaryFile source → mapInPandas decode/feature stage: generate "
        "deterministic binary fixtures, ingest as BinaryType + metadata, "
        "run the Arrow-batched decode stub, return per-file features.",
)
def e_multimodal(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="multimodal_")
    # Deterministic binary fixtures derived from the orders table.
    rows = (
        table(spark, sf_dir, "orders")
        .limit(20)
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    for r in rows:
        blob = (f"{r.o_orderkey}:{r.o_totalprice}".encode() * 50)[:997]
        with open(os.path.join(tmp, f"blob_{r.o_orderkey:06d}.bin"), "wb") as f:
            f.write(blob)
    files = spark.read.format("binaryFile").load(tmp)
    decoded = files.select("path", "content").mapInPandas(
        _decode_batches, schema=_DECODE_SCHEMA
    )
    return decoded
