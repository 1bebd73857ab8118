"""Fresh-process timing of q_xml_nested_explode variants (argv[1])."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from xml_processor_spark.io import table, widen
from xml_processor_spark.session import build_session

SF = "/root/testdata/sf0.1"
SCHEMA = "okey LONG, line ARRAY<STRUCT<ln: INT, qty_c: LONG>>"


def line_xml():
    return F.concat(
        F.lit("<line><ln>"), F.col("l_linenumber").cast("string"),
        F.lit("</ln><qty_c>"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").cast("string"),
        F.lit("</qty_c></line>"),
    )


def finish(per_order):
    parsed = per_order.select(F.from_xml("xml", SCHEMA).alias("x"))
    return parsed.select(
        F.col("x.okey").alias("okey"), F.explode("x.line").alias("l")
    ).select("okey", F.col("l.ln").alias("ln"), F.col("l.qty_c").alias("qty_c"))


def mk_current(li):
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.concat_ws("", F.sort_array(F.collect_list(line_xml()))).alias("lines"))
        .select(
            F.concat(
                F.lit("<order><okey>"), F.col("l_orderkey").cast("string"),
                F.lit("</okey>"), F.col("lines"), F.lit("</order>"),
            ).alias("xml")
        )
    )
    return finish(per_order)


def main():
    variant = sys.argv[1]
    spark = build_session("exp")
    spark.sparkContext.setLogLevel("ERROR")
    li = table(spark, SF, "lineitem")

    if variant == "current":
        mk = lambda: mk_current(li)  # noqa: E731
    elif variant == "widen_pre_groupby":
        mk = lambda: mk_current(widen(li))  # noqa: E731
    else:
        raise SystemExit(f"unknown variant {variant}")

    mk().toPandas()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        p = mk().toPandas()
        ts.append(time.perf_counter() - t0)
    print("SENTINEL", variant, round(sorted(ts)[1], 3), "rows", len(p))
    spark.stop()


if __name__ == "__main__":
    main()
