"""Deduplication operators (SURVEY §2.K) — exact, near-dup, MinHash-LSH.

Three rungs of the dedup ladder a training-data pipeline needs:

1. `q_dedup_exact` — content-hash groupBy; one shuffle proportional to
   |distinct contents|. The 100 TB workhorse.
2. `q_dedup_near_jaccard` — exact token-set Jaccard over token-blocked
   candidate pairs; quadratic in block size, used as ground truth.
3. `E-MINHASH-LSH` — the scale path: shingle → seeded MinHash signatures →
   banded LSH buckets → candidate pairs. Deterministic hash family
   (xxhash64(concat(token, seed))) — never rand() (SURVEY §7 hard-point e).
   Recall vs the exact truth is asserted in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_dedup_exact",
    oracle="""
        SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    origin="LLM",
    doc="Exact dedup: md5 fingerprint groups, keep lowest doc_id.",
)
def q_dedup_exact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )


# Integer-exact threshold: J = i/(|A|+|B|-i) >= 0.95  ⇔  100*i >= 95*(|A|+|B|-i)
_TAU_NUM, _TAU_DEN = 95, 100


@register(
    "q_dedup_near_jaccard",
    oracle=f"""
        WITH dt AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(i / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE {_TAU_DEN} * i >= {_TAU_NUM} * (sa.n + sb.n - i)
    """,
    origin="LLM",
    doc="Near-dup pairs: token-set Jaccard >= 0.95 via token-blocked "
        "self-join + integer-exact threshold (no float compare at the "
        "boundary). Ground truth for the LSH recall test.",
)
def q_dedup_near_jaccard(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dt.select(F.col("doc_id").alias("id_a"), "tok")
    b = dt.select(F.col("doc_id").alias("id_b"), "tok")
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("i")
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(_TAU_DEN * F.col("i") >= _TAU_NUM * union_sz)
        .select(
            "id_a", "id_b",
            F.round(F.col("i") / union_sz.cast("double"), 6).alias("jaccard"),
        )
    )


_N_HASHES = 32  # MinHash signature length
# 4 bands × 8 rows: P(candidate | J=0.95) ≈ 1-(1-0.95^8)^4 ≈ 0.99.
_N_BANDS = 4
_SHINGLE_K = 3  # word-shingle width


def shingles(text_col):
    """Distinct 3-word shingles of a document.

    Unigram token sets are useless on a ~30-word vocabulary (every doc-pair
    lands at J≈0.9 and LSH buckets explode quadratically — measured 10M+
    candidate pairs at sf0.1); k-word shingles restore a large feature
    space, so band collisions mean real near-duplication, not shared
    vocabulary. This is the standard MinHash formulation for text.
    """
    toks = F.split(text_col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - _SHINGLE_K + 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(_SHINGLE_K)]
            ),
        )
    )


@register(
    "E-MINHASH-LSH",
    oracle=None,
    origin="LLM",
    doc="Scalable near-dup candidates: per-doc MinHash signature from a "
        "seeded xxhash64 family over distinct 3-word shingles, banded into "
        f"{_N_BANDS} LSH buckets; candidate pairs share >= 1 band. "
        "Shuffle cost is |docs| x bands, never |docs|^2 — the 100 TB path. "
        "Recall vs exact shingle-Jaccard asserted in tests/test_llm.py.",
)
def e_minhash_lsh(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    dt = d.select("doc_id", F.explode(shingles(F.col("text"))).alias("tok"))
    # 32 deterministic hash functions from two independent xxhash64 values
    # mixed bitwise (h1 XOR rotate(h2, r_i)) — 2 string hashes per shingle
    # instead of 32 (double-hashing family), and bit ops can't overflow
    # under ANSI mode. 16x less hashing on the 100 TB path.
    hashed = dt.select(
        "doc_id",
        F.xxhash64("tok").alias("h1"),
        F.xxhash64(F.concat(F.lit("x"), F.col("tok"))).alias("h2"),
    )

    def _mix(i: int):
        if i == 0:
            return F.col("h1")
        r = (7 * i) % 63 + 1
        rot = F.expr(f"shiftleft(h2, {r}) | shiftrightunsigned(h2, {64 - r})")
        return F.expr("h1") .bitwiseXOR(rot)

    mins = hashed.groupBy("doc_id").agg(
        *[F.min(_mix(i)).alias(f"h{i}") for i in range(_N_HASHES)]
    )
    rows_per_band = _N_HASHES // _N_BANDS
    band_cols = [
        F.xxhash64(
            F.lit(b),
            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(_N_BANDS)
    ]
    banded = mins.select("doc_id", *band_cols)
    # doc → (band_idx, band_hash) rows; bucket-join per band.
    long_form = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("sig"))
                for b in range(_N_BANDS)
            ])
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    l = long_form.select(F.col("doc_id").alias("id_a"), "band", "sig")
    r = long_form.select(F.col("doc_id").alias("id_b"), "band", "sig")
    return (
        l.join(r, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
