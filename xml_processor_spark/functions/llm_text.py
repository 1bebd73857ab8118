"""Text-analysis operators (SURVEY §2.K) — wordcount, TF-IDF, n-grams,
lexicon sentiment, language stats.

All token work is native split/explode/groupBy (JVM, whole-stage codegen);
the lexicon is a broadcast map-side join (cf. sentiment-at-scale pattern,
PAPERS.md: EDBT 2016 Spark sentiment). Everything aggregates to counts and
integer weights — no float nondeterminism anywhere except the explicitly
rounded idf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_TOP_WORDS = 50

_LEXICON = [
    ("fast", 2), ("merge", 1), ("key", 1), ("order", 1), ("window", 2),
    ("scan", -2), ("sort", -1), ("table", -1), ("part", -1), ("spill", -3),
]


@register(
    "q_text_wordcount",
    oracle=f"""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT {_TOP_WORDS}
    """,
    origin="LLM",
    doc="Global top-50 token counts (count desc, token asc total order).",
)
def q_text_wordcount(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(_TOP_WORDS)
    )


@register(
    "q_text_tfidf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n FROM documents)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               round(tf.tf * ln((n.n + 1) / CAST(df.df + 1 AS DOUBLE)), 6) AS w
        FROM tf JOIN df USING (term) CROSS JOIN n
    """,
    origin="LLM",
    doc="TF-IDF per (doc, term): tf from a token groupBy, df from a "
        "term groupBy, idf = ln((N+1)/(df+1)) — two shuffles total, df "
        "side broadcast back.",
)
def q_text_tfidf(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            r6(
                F.col("tf")
                * F.log((F.col("n") + 1) / (F.col("df") + 1).cast("double"))
            ).alias("w"),
        )
    )


@register(
    "q_text_ngrams",
    oracle="""
        SELECT lang, bigram, count(*) AS n
        FROM (
            SELECT t.lang, t.toks[u.gs] || ' ' || t.toks[u.gs + 1] AS bigram
            FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents) t,
                 LATERAL (SELECT unnest(generate_series(1, len(t.toks) - 1)) AS gs) u
        )
        GROUP BY lang, bigram
    """,
    origin="LLM",
    doc="Bigram counts per language (adjacent-token pairs via an indexed "
        "array transform — no self-join).",
)
def q_text_ngrams(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_text_sentiment",
    oracle=f"""
        WITH lex(word, wt) AS (VALUES {", ".join(f"('{w}', {s})" for w, s in _LEXICON)}),
        toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        SELECT t.doc_id, SUM(COALESCE(l.wt, 0)) AS score
        FROM toks t LEFT JOIN lex l ON t.tok = l.word
        GROUP BY t.doc_id
    """,
    origin="LLM",
    doc="Lexicon-based sentiment: tokens x broadcast 10-word lexicon, "
        "integer weight sum per document (EDBT'16 Spark-sentiment shape).",
)
def q_text_sentiment(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(_LEXICON, "word STRING, wt INT")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return (
        toks.join(F.broadcast(lex), toks.tok == lex.word, "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("wt", F.lit(0))).alias("score"))
    )


@register(
    "q_text_lang_stats",
    oracle="""
        SELECT lang, count(*) AS n_docs,
               round(avg(n_chars), 6) AS avg_chars,
               count(*) FILTER (WHERE n_chars <> length(text)) AS n_violations
        FROM documents GROUP BY lang
    """,
    origin="LLM",
    doc="Per-language doc count, average length, and metadata-vs-content "
        "violation count (n_chars <> length(text)) — a data-quality gate.",
)
def q_text_lang_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r6(F.avg("n_chars")).alias("avg_chars"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1)).alias(
            "n_violations"
        ),
    )
