"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The extension surface a platform team uses to wrap an in-house system
(a feed gateway, a billing API, a proprietary file format) as a
first-class ``spark.read.format(...)`` source: schema declaration,
partition planning, and per-partition reads all live in Python, while
Spark distributes the partitions like any other scan.

The registered source here is a deterministic synthetic-sequence
generator (``rows`` evenly split across ``parts`` partitions; each row
carries its md5 fingerprint) — deliberately RNG-free so the scan is
reproducible across runs, executors, and engines, which is what makes
`E-PYSOURCE` oracle-checkable: DuckDB regenerates the identical rows
from ``generate_series`` + ``md5``.

Scale shape: partition planning is metadata-only (``parts`` InputPartition
stubs); each partition generates its own contiguous range — no driver
materialization, no shuffle; a real connector swaps the generator body
for its client library and keeps the planning contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from xml_processor_spark.registry import register

_ROWS = 10_000
_PARTS = 8


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", _ROWS))
        self.parts = int(options.get("parts", _PARTS))

    def partitions(self):
        per = -(-self.rows // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        import hashlib

        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(str(i).encode()).hexdigest())


class SequenceDataSource(DataSource):
    """``spark.read.format("xps_seq").option("rows", n)`` source."""

    @classmethod
    def name(cls):
        return "xps_seq"

    def schema(self):
        return "seq_id BIGINT, fingerprint STRING"

    def reader(self, schema):
        return _SeqReader(self.options)


@register(
    "E-PYSOURCE",
    oracle=f"""
        WITH seq AS (
            SELECT CAST(unnest(generate_series(0, {_ROWS} - 1)) AS BIGINT)
                   AS seq_id
        )
        SELECT substring(md5(CAST(seq_id AS VARCHAR)), 1, 2) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(seq_id) AS first_id,
               max(seq_id) AS last_id
        FROM seq
        GROUP BY 1
    """,
    origin="LLM",
    doc="Custom Python Data Source (Spark 4 pyspark.sql.datasource): a "
        "registered format('xps_seq') whose schema declaration, "
        "partition planning and per-partition reads run in Python — the "
        "extension point for wrapping proprietary systems as first-class "
        "Spark scans. The registered instance generates a deterministic "
        f"md5-fingerprinted sequence ({_ROWS} rows over {_PARTS} "
        "planned partitions, RNG-free), and the query aggregates it by "
        "fingerprint prefix — so the DuckDB oracle regenerates the "
        "SAME rows from generate_series + md5 and a hash match proves "
        "the source delivered every partition exactly once (a dropped "
        "or duplicated partition shifts bucket counts and min/max ids). "
        "Scale shape: planning is metadata-only; each partition "
        "generates its own range; the aggregate is map-side-combined.",
)
def e_pysource(spark, sf_dir):
    spark.dataSource.register(SequenceDataSource)
    df = spark.read.format("xps_seq").option("rows", _ROWS).load()
    return df.groupBy(
        F.substring("fingerprint", 1, 2).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq_id").alias("first_id"),
        F.max("seq_id").alias("last_id"),
    )
