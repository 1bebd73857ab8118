"""Table loading — DataFrames over the driver-generated parquet star schema.

Tables (FIXTURES.md): region nation customer supplier part orders lineitem
events documents embeddings. Reads go through ``spark.read.parquet`` so
predicate pushdown / column pruning / vectorized scanning apply untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read the raw int64 nanos (legacy conf, runtime
        # settable) and convert to a µs timestamp JVM-side. Integer `div`
        # keeps full precision (double division would lose µs at 1e18 ns).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for ``spark.sql`` query rows)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
