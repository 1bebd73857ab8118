"""UDF/UDAF/UDTF surface (SURVEY §2.J) — the custom-parsing escape hatch.

BASELINE.json names "custom XML parsing UDFs" as the fallback approach; the
engine's rule (SURVEY §4) is: native functions on hot paths, and when Python
is unavoidable, Arrow-vectorized pandas UDFs — never row-at-a-time Python in
the data plane. The row UDF here exists to prove the slow path's semantics;
everything else is Arrow-batched.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import register_views, table, widen
from xml_processor_spark.registry import register


@register(
    "q_udf_python",
    oracle="""
        SELECT c_custkey,
               regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') AS norm_name
        FROM customer
    """,
    origin="REF",
    doc="Row Python UDF: text normalization (stands in for custom XML/text "
        "shredding [BASELINE.json]). Deliberately the slow path — the "
        "pandas variants below are the production idiom.",
)
def q_udf_python(spark, sf_dir):
    import re

    @F.udf(returnType=StringType())
    def normalize(s: str) -> str:
        return re.sub(r"[^a-z0-9]", "", s.lower()) if s is not None else None

    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", normalize("c_name").alias("norm_name"))


@register(
    "q_udf_pandas",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
    """,
    doc="Vectorized scalar pandas UDF (Arrow batches): net price. Same IEEE "
        "ops as the SQL expression → bit-identical.",
)
def q_udf_pandas(spark, sf_dir):
    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    # NOTE: no widen() here — measured: repartitioning 600k rows before the
    # Arrow hop costs more than single-partition vectorized execution saves.
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "q_udaf_pandas",
    oracle="""
        SELECT l_returnflag,
               round(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         * CAST(round(l_discount*100) AS BIGINT))
                     / CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
                     / 100, 6) AS wavg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-agg pandas UDAF: discount-weighted average price, computed "
        "in exact integer cents inside the UDF so partition order cannot "
        "perturb the double sum.",
)
def q_udaf_pandas(spark, sf_dir):
    @F.pandas_udf("double")
    def wavg(price: pd.Series, disc: pd.Series) -> float:
        pc = (price * 100).round().astype("int64")
        dc = (disc * 100).round().astype("int64")
        return round(float(int((pc * dc).sum()) / float(int(dc.sum())) / 100), 6)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_discount").alias("wavg_price")
    )


@register(
    "q_udf_grouped_map",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round((l_quantity - avg(l_quantity) OVER w)
                     / stddev_samp(l_quantity) OVER w, 6) AS z
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag)
    """,
    doc="Grouped-map applyInPandas: per-returnflag z-score of quantity "
        "(ddof=1 to match stddev_samp).",
)
def q_udf_grouped_map(spark, sf_dir):
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        z = (q - q.mean()) / q.std(ddof=1)
        return pd.DataFrame({
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "z": z.round(6),
        })

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        zscore, "l_orderkey LONG, l_linenumber INT, z DOUBLE"
    )


@register(
    "q_udtf",
    oracle="""
        SELECT t.doc_id, u.gs - 1 AS pos, t.toks[u.gs] AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS gs) u
        WHERE len(t.toks[u.gs]) >= 4
    """,
    doc="Python UDTF (Spark 4): one document row → (pos, word) rows for "
        "words of length >= 4, applied via a SQL lateral join.",
)
def q_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos BIGINT, word STRING")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                if len(w) >= 4:
                    yield i, w

    spark.udtf.register("split_words", SplitWords)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM documents d, LATERAL split_words(d.text) t
        """
    )
