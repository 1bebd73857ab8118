"""Fresh-process timing for q_udf_pandas with/without widen (argv[1])."""
import sys
import time

sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from xml_processor_spark.io import table, widen
from xml_processor_spark.session import build_session

SF = "/root/testdata/sf0.1"


def main():
    variant = sys.argv[1]
    spark = build_session("exp")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = table(spark, SF, "lineitem")
    src = widen(li) if variant == "widen" else li
    mk = lambda: src.select(  # noqa: E731
        "l_orderkey", "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )
    mk().collect()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = len(mk().collect())
        ts.append(time.perf_counter() - t0)
    print("SENTINEL", variant, round(sorted(ts)[1], 3), "rows", n)
    spark.stop()


if __name__ == "__main__":
    main()
