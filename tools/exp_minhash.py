"""Fresh-process timing of one MinHash-LSH variant (argv[1]).

Variants: old (explode+groupBy, committed form), old_widen (same + widen'd
scan). Run each in its own process — warm-session measurements drift badly.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from xml_processor_spark.functions.llm_dedup import _N_BANDS, _N_HASHES, shingles
from xml_processor_spark.io import table, widen
from xml_processor_spark.session import build_session

SF = "/root/testdata/sf0.1"


def bands_and_join(mins):
    rpb = _N_HASHES // _N_BANDS
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"h{b*rpb+r}") for r in range(rpb)]).alias(f"band{b}")
        for b in range(_N_BANDS)
    ]
    banded = mins.select("doc_id", *band_cols)
    long_form = banded.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("sig"))
            for b in range(_N_BANDS)
        ])).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    l = long_form.select(F.col("doc_id").alias("id_a"), "band", "sig")
    r = long_form.select(F.col("doc_id").alias("id_b"), "band", "sig")
    return (
        l.join(r, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def mins_explode(src):
    dt = src.select("doc_id", F.explode(shingles(F.col("text"))).alias("tok"))
    hashed = dt.select(
        "doc_id",
        F.xxhash64("tok").alias("h1"),
        F.xxhash64(F.concat(F.lit("x"), F.col("tok"))).alias("h2"),
    )

    def _mix(i):
        if i == 0:
            return F.col("h1")
        rr = (7 * i) % 63 + 1
        rot = F.expr(f"shiftleft(h2,{rr}) | shiftrightunsigned(h2,{64-rr})")
        return F.expr("h1").bitwiseXOR(rot)

    return hashed.groupBy("doc_id").agg(
        *[F.min(_mix(i)).alias(f"h{i}") for i in range(_N_HASHES)]
    )


def main():
    variant = sys.argv[1]
    spark = build_session("exp")
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF, "documents")

    if variant == "old":
        mk = lambda: bands_and_join(mins_explode(d))  # noqa: E731
    elif variant == "old_widen":
        mk = lambda: bands_and_join(mins_explode(widen(d)))  # noqa: E731
    elif variant == "sig_only":
        mk = lambda: mins_explode(d).select(F.sum("h0").alias("s"))  # noqa: E731
    elif variant == "sig_only_widen":
        mk = lambda: mins_explode(widen(d)).select(F.sum("h0").alias("s"))  # noqa: E731
    else:
        raise SystemExit(f"unknown variant {variant}")

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
