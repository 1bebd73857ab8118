"""Scalar function surface (SURVEY §2.H) — string/date/math/array/map/hash.

These are the expression vocabulary of the reference's transform stage
[P: CDAP XMLParser casts + expression-ish directives] exposed as native
Catalyst expressions (JVM codegen, no Python in the data plane).

Cross-engine notes baked in here:
- Spark ``dayofweek`` is 1..7 Sunday-first, DuckDB ``dow`` 0..6 → normalized.
- ``months_between`` semantics differ → whole-month arithmetic on both sides.
- Transcendental fns (exp/ln/log10/pow) differ at the last ulp between
  libm and the JVM → rounded to 6 dp.
- DuckDB ``map[key]`` returns a LIST → ``map_extract(...)[1]``.
- ``array_distinct`` order is engine-defined → always wrapped in sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register


@register(
    "q_str_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS up_name,
               lower(c_mktsegment) AS lo_seg,
               trim(concat('  ', c_name, ' ')) AS trimmed,
               substring(c_name, 1, 8) AS sub8,
               concat_ws('|', c_name, c_mktsegment) AS joined,
               length(c_name) AS name_len,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               reverse(c_mktsegment) AS rev_seg,
               translate(c_name, '#0', '_O') AS xlated
        FROM customer
    """,
    doc="upper/lower/trim/substring/concat_ws/length/lpad/reverse/translate.",
)
def q_str_funcs(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.translate("c_name", "#0", "_O").alias("xlated"),
    )


@register(
    "q_str_regex",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
               regexp_replace(p_type, '[AEIOU]', '*', 'g') AS devoweled,
               string_split(p_type, ' ')[1] AS first_word,
               len(string_split(p_type, ' ')) AS n_words
        FROM part
    """,
    doc="regexp_extract (group), global regexp_replace, split + indexing. "
        "DuckDB needs the 'g' flag to match Spark's replace-all.",
)
def q_str_regex(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    toks = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_type", "[AEIOU]", "*").alias("devoweled"),
        toks.getItem(0).alias("first_word"),
        F.size(toks).alias("n_words"),
    )


@register(
    "q_str_levenshtein",
    oracle="""
        SELECT brand, dist, CAST(count(*) AS BIGINT) AS n_pairs
        FROM (
            SELECT a.p_brand AS brand,
                   levenshtein(a.p_name, b.p_name) AS dist
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        )
        GROUP BY 1, 2
    """,
    origin="LLM",
    doc="Edit-distance profile of part-name pairs within a brand: per "
        "(brand, dist) pair counts over the blocked self-join — the "
        "same blocking pattern the near-dup ops use, aggregated the way "
        "a 100 TB job must be. r11 reshape: the old pair-LIST output is "
        "~C(block,2) rows (8e8 at the SF1 fixture, where dist <= 12 "
        "keeps every 2-word-name pair — uncollectable and an "
        "anti-pattern at any real scale), while the histogram hashes "
        "EVERY one of those distances into a bounded |brands| x "
        "|dists| table — a strictly stronger aggregate check with "
        "scale-independent output. The engine widens both scans first "
        "(8e8 DP evaluations is a parallelize-or-stall quantity: one "
        "unwidened row group ran single-core 30+ min; spread on 32 "
        "cores it is ~1 min) and the groupBy combines map-side.",
)
def q_str_levenshtein(spark, sf_dir):
    from xml_processor_spark.io import widen

    p = widen(
        table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(
            b,
            (F.col("brand") == F.col("brand_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .select("brand", F.levenshtein("name_a", "name_b").alias("dist"))
        .groupBy("brand", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_date_parts",
    oracle="""
        SELECT o_orderkey,
               date_part('year', o_orderdate) AS yr,
               date_part('month', o_orderdate) AS mo,
               date_part('day', o_orderdate) AS dy,
               date_part('quarter', o_orderdate) AS qtr,
               date_part('dow', o_orderdate) AS dow0,
               date_trunc('month', o_orderdate) AS month_start
        FROM orders
    """,
    doc="Date-part extraction; dow normalized to 0..6 Sunday-first (Spark "
        "dayofweek is 1..7); month_start as DATE (DuckDB's date_trunc"
        "('month') yields DATE, Spark's TIMESTAMP → use trunc()).",
)
def q_date_parts(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.quarter(d).cast("long").alias("qtr"),
        (F.dayofweek(d) - 1).cast("long").alias("dow0"),
        F.trunc(d, "month").alias("month_start"),
    )


@register(
    "q_date_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
               (2002 - date_part('year', o_orderdate)) * 12
                   + (1 - date_part('month', o_orderdate)) AS months_to_2002,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
    doc="date_add/datediff/whole-month diff/last_day. months_between is "
        "avoided (fractional semantics differ between engines); whole-month "
        "arithmetic is identical on both sides.",
)
def q_date_arith(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
        ((2002 - F.year(d)) * 12 + (1 - F.month(d))).cast("long").alias("months_to_2002"),
        F.last_day(d).alias("month_end"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_d,
               round(l_extendedprice, 1) AS r1_price,
               floor(l_quantity) AS fl_qty,
               ceil(l_extendedprice / 1000) AS ceil_k,
               round(pow(l_quantity, 2), 6) AS qty_sq,
               round(sqrt(l_extendedprice), 6) AS sqrt_price,
               round(exp(l_discount), 6) AS exp_disc,
               round(ln(l_extendedprice), 6) AS ln_price,
               round(log10(l_extendedprice), 6) AS log10_price,
               mod(l_linenumber, 3) AS mod3,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
               greatest(l_quantity, l_extendedprice / 1000) AS gr,
               least(l_quantity, l_extendedprice / 1000) AS le
        FROM lineitem
    """,
    doc="abs/round/floor/ceil/pow/sqrt/exp/ln/log10/mod/sign/greatest/least; "
        "transcendentals rounded to 6 dp (libm-vs-JVM last-ulp).",
)
def q_math_funcs(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    q, p, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(disc - 0.05).alias("abs_d"),
        F.round(p, 1).alias("r1_price"),
        F.floor(q).cast("double").alias("fl_qty"),
        F.ceil(p / 1000).cast("double").alias("ceil_k"),
        r6(F.pow(q, 2)).alias("qty_sq"),
        r6(F.sqrt(p)).alias("sqrt_price"),
        r6(F.exp(disc)).alias("exp_disc"),
        r6(F.log(p)).alias("ln_price"),
        r6(F.log10(p)).alias("log10_price"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.signum(disc - 0.05).alias("sgn"),
        F.greatest(q, p / 1000).alias("gr"),
        F.least(q, p / 1000).alias("le"),
    )


@register(
    "q_hash_md5",
    oracle="""
        SELECT doc_id, md5(text) AS fp, lang
        FROM documents
    """,
    origin="LLM",
    doc="Content fingerprint (md5) per document — the dedup primitive.",
)
def q_hash_md5(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("fp"), "lang")


@register(
    "q_array_funcs",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               list_contains(string_split(text, ' '), 'the') AS has_the,
               array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
                   AS vocab,
               array_to_string(string_split(text, ' ')[1:5], ',') AS head5,
               string_split(text, ' ')[3] AS third_tok
        FROM documents
    """,
    origin="LLM",
    doc="size/contains/distinct/sort/slice/element_at over token arrays "
        "(distinct wrapped in sort: its order is engine-defined).",
)
def q_array_funcs(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "the").alias("has_the"),
        F.concat_ws(",", F.sort_array(F.array_distinct(toks))).alias("vocab"),
        F.concat_ws(",", F.slice(toks, 1, 5)).alias("head5"),
        F.element_at(toks, 3).alias("third_tok"),
    )


@register(
    "q_array_lambda",
    oracle="""
        SELECT vec_id,
               round(list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
               len(list_filter(embedding, x -> x > 0)) AS n_pos,
               round(sqrt(list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm
        FROM embeddings
    """,
    origin="LLM",
    doc="Higher-order array fns (transform/filter/aggregate) over the "
        "embedding column — the JVM-side vector math the kNN ops build on.",
)
def q_array_lambda(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        r6(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x)).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        r6(
            F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x))
        ).alias("l2_norm"),
    )


@register(
    "q_explode",
    oracle="""
        SELECT t.doc_id, u.gs - 1 AS pos, t.toks[u.gs] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
             LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS gs) u
    """,
    origin="LLM",
    doc="posexplode tokens to rows (0-based position; DuckDB 1.0 has no "
        "WITH ORDINALITY → lateral generate_series subscripting).",
)
def q_explode(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "q_map_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               array_to_string(list_sort(map_keys(
                   MAP(['qty','price'], [l_quantity, l_extendedprice]))), ',') AS ks,
               map_extract(MAP(['qty','price'],
                   [l_quantity, l_extendedprice]), 'qty')[1] AS qty_val,
               len(map_values(MAP(['qty','price'],
                   [l_quantity, l_extendedprice]))) AS n_vals
        FROM lineitem
    """,
    doc="create_map/map_keys/map_values/element_at. DuckDB map[key] yields "
        "a LIST → map_extract(...)[1]; key lists sorted for determinism.",
)
def q_map_funcs(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("ks"),
        F.element_at(m, "qty").alias("qty_val"),
        F.size(F.map_values(m)).alias("n_vals"),
    )


@register(
    "q_str_binhex",
    oracle="""
        SELECT doc_id,
               base64(encode(text)) AS b64,
               upper(substring(hex(encode(substring(text, 1, 8))), 1, 16))
                   AS hex_head,
               CAST(octet_length(from_base64(base64(encode(text))))
                    AS BIGINT) AS decoded_len
        FROM documents
    """,
    doc="Binary codec functions over the text→bytes boundary: base64 "
        "encoding of the UTF-8 bytes, a hex prefix (upper-cased on both "
        "engines — Spark hex() emits uppercase, DuckDB's case differs by "
        "build), and a base64 decode roundtrip whose byte length must "
        "equal the original. Spark base64() MIME-wraps at 76 chars with "
        "CRLF while DuckDB emits one line, so the wrap is stripped before "
        "compare (unbase64 accepts both). The codec layer every "
        "multimodal/binary pipeline crosses when bytes transit JSON or "
        "text protocols; all JVM expressions, zero shuffle.",
)
def q_str_binhex(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    b64 = F.regexp_replace(F.base64(blob), "[\\r\\n]", "")
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.upper(
            F.substring(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")), 1, 16)
        ).alias("hex_head"),
        F.octet_length(F.unbase64(b64)).cast("long").alias("decoded_len"),
    )
