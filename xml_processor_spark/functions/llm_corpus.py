"""Corpus-level lexical association & source comparison (SURVEY §2.K ext).

Two corpus-QA operators a training-data pipeline runs per data drop:

- `q_text_collocations` — PMI-scored word bigram collocations over the
  whole corpus. PMI is the standard collocation measure (Church & Hanks);
  a crawler regression that injects boilerplate shows up instantly as a
  new block of impossibly-high-PMI pairs.
- `q_source_vocab_overlap` — pairwise Jaccard overlap of the per-source
  vocabularies: the cheap lexical fingerprint that flags two "different"
  sources as mirrors of each other BEFORE the expensive content-level
  dedup (MinHash/SimHash) runs.

House scale rules:

- tokenization is the repo-wide declared split on single spaces (same as
  q_text_ngrams / q_text_wordcount — cross-operator consistency is part
  of the contract).
- **aggregate first**: unigram/bigram/vocab tables are map-side-combined
  aggregates off ONE corpus scan; every join after is an equi join on the
  token key (hash-shuffled, never all-pairs). The collocation output is
  bounded by the declared min-count support threshold; the overlap output
  by |sources|².
- exact BIGINT counts everywhere; PMI is ONE ln() over one double ratio
  of exact integers, 6-dp rounded on identical cross-engine trees.

Reference surface: none — LLM-pipeline extensions mandated by
BASELINE.json (same family as llm_text.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xml_processor_spark.functions.deterministic import r6
from xml_processor_spark.io import table
from xml_processor_spark.registry import register

# Support threshold: a bigram must occur this often to be scored. This is
# the standard collocation-extraction guard (PMI explodes on hapax pairs)
# AND the output bound — at ANY corpus size the result is at most
# total_bigrams / _MIN_PAIR rows.
_MIN_PAIR = 5

# UniMax epoch cap: no domain may be repeated more than this many times in
# the sampled mixture (UniMax, arXiv:2304.09151 — cap repetition of
# low-resource domains instead of temperature-flattening everything).
_UNIMAX_CAP = 2

# Temperature-sampling exponent: p_d ∝ s_d^α. α = 0.3 is the published
# multilingual-pretraining convention (XLM-R / mT5) UniMax argues against;
# both belong in a curation toolbox so mixtures can be compared.
_TEMP_ALPHA = 0.3


@register(
    "q_domain_temperature",
    oracle=f"""
        WITH dom AS (
            SELECT source, lang,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS s
            FROM documents GROUP BY 1, 2
        ), pw AS (
            SELECT source, lang, s,
                   CAST(round(exp({_TEMP_ALPHA} * ln(CAST(s AS DOUBLE)))
                              * 1000000) AS BIGINT) AS p_e6
            FROM dom
        ), tot AS (
            SELECT CAST(sum(s) AS BIGINT) AS st,
                   CAST(sum(p_e6) AS BIGINT) AS pt_e6
            FROM pw
        )
        SELECT source, lang, s AS n_tokens,
               round(CAST(s AS DOUBLE) / CAST(tot.st AS DOUBLE), 6)
                   AS raw_share,
               round(CAST(p_e6 AS DOUBLE) / CAST(tot.pt_e6 AS DOUBLE), 6)
                   AS temp_share,
               round(CAST(p_e6 AS DOUBLE) / CAST(tot.pt_e6 AS DOUBLE)
                     / (CAST(s AS DOUBLE) / CAST(tot.st AS DOUBLE)), 6)
                   AS boost
        FROM pw CROSS JOIN tot
    """,
    origin="LLM",
    doc=f"Temperature-sampling mixture weights (α = {_TEMP_ALPHA}, the "
        "XLM-R/mT5 multilingual convention): per (source, lang) domain, "
        "the raw corpus share s_d/Σs, the temperature-flattened share "
        "s_d^α/Σs^α, and the resulting up/down-sampling boost — the "
        "baseline mixture q_domain_unimax's capped water-filling is the "
        "published improvement over. Determinism: s^α is evaluated as "
        "exp(α·ln s) — one shared formulation BOTH engines compute with "
        "the same two libm-grade calls (ADVICE r9: JVM Math.pow and "
        "DuckDB pow need not agree to the ulp near .5 fixed-point "
        "boundaries; the repo's other ln-based keys pin exp/ln parity) — "
        "then fixed-pointed to 1e-6 PER DOMAIN "
        "before the total folds (the DSIR lr_e6 pattern), so Σs^α is an "
        "exact integer sum — order-independent on any partitioning — and "
        "every 6-dp output is one division of exact integers. Scale "
        "shape: ONE corpus scan collapses map-side to the |domains| "
        "table; the totals row is a 1-row broadcast.",
)
def q_domain_temperature(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    dom = d.groupBy("source", "lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("s")
    )
    pw = dom.withColumn(
        "p_e6",
        F.round(
            F.exp(F.lit(_TEMP_ALPHA) * F.log(F.col("s").cast("double")))
            * 1_000_000,
            0,
        ).cast("long"),
    )
    tot = pw.agg(
        F.sum("s").cast("long").alias("st"),
        F.sum("p_e6").cast("long").alias("pt_e6"),
    )
    raw = F.col("s").cast("double") / F.col("st").cast("double")
    temp = F.col("p_e6").cast("double") / F.col("pt_e6").cast("double")
    return pw.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        F.col("s").alias("n_tokens"),
        r6(raw).alias("raw_share"),
        r6(temp).alias("temp_share"),
        r6(temp / raw).alias("boost"),
    )


@register(
    "q_domain_unimax",
    oracle=f"""
        WITH dom AS (
            SELECT source, lang,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS s
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT CAST(sum(s) AS BIGINT) AS budget,
                   CAST(count(*) AS BIGINT) AS n
            FROM dom
        ), ord AS (
            SELECT source, lang, s, {_UNIMAX_CAP} * s AS cap,
                   row_number() OVER w AS i,
                   coalesce(sum({_UNIMAX_CAP} * s) OVER (
                       w ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS prefix
            FROM dom
            WINDOW w AS (ORDER BY {_UNIMAX_CAP} * s, source, lang)
        ), flag AS (
            SELECT ord.*, tot.budget, tot.n,
                   cap * (tot.n - i + 1) <= tot.budget - prefix AS capped
            FROM ord CROSS JOIN tot
        ), lvl AS (
            SELECT CAST(budget - prefix AS DOUBLE) / CAST(n - i + 1 AS DOUBLE)
                   AS t
            FROM flag WHERE NOT capped ORDER BY i LIMIT 1
        )
        SELECT source, lang, s AS n_tokens, cap AS capacity, capped,
               round(CASE WHEN capped THEN CAST(cap AS DOUBLE)
                          ELSE (SELECT t FROM lvl) END, 6) AS alloc,
               round(CASE WHEN capped THEN CAST(cap AS DOUBLE)
                          ELSE (SELECT t FROM lvl) END
                     / CAST(s AS DOUBLE), 6) AS epochs
        FROM flag
    """,
    origin="LLM",
    doc="UniMax domain-mixture allocation (arXiv:2304.09151): spread a "
        "token budget (= one corpus pass) across (source, lang) domains "
        "uniformly, but cap every domain at "
        f"{_UNIMAX_CAP} epochs of its own tokens — the published "
        "alternative to temperature sampling that stops low-resource "
        "domain over-repetition. Water-filling in closed form: domains "
        "sorted ascending by capacity; a domain is capped iff "
        "cap·r ≤ B − prefix (ALL exact BIGINT — the branch never floats), "
        "where r counts remaining domains and prefix is the exclusive "
        "capacity cumsum; the test is monotone along the sort, so the "
        "capped set is a prefix and every uncapped domain gets the SINGLE "
        "water level t = (B − prefix_k)/r_k fixed at the first uncapped "
        "row k — one double division, identical cross-engine. Scale "
        "shape: ONE corpus scan collapses map-side to the |domains| "
        "grouped table; every window after runs on that bounded table "
        "(|sources|·|langs| rows at ANY corpus size), and the level is a "
        "1-row broadcast.",
)
def q_domain_unimax(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    dom = (
        d.groupBy("source", "lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("s"))
        .withColumn("cap", F.lit(_UNIMAX_CAP) * F.col("s"))
    )
    # Bounded-table windows: dom is |domains| rows (99 at the fixture,
    # |sources|x|langs| always), so the unpartitioned frames below never
    # see corpus-scale data.
    w = Window.orderBy("cap", "source", "lang")
    tot = dom.agg(
        F.sum("s").cast("long").alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    flag = (
        dom.withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "capped",
            F.col("cap") * (F.col("n") - F.col("i") + 1)
            <= F.col("budget") - F.col("prefix"),
        )
    )
    lvl = (
        flag.filter(~F.col("capped"))
        .orderBy("i")
        .limit(1)
        .select(
            (
                (F.col("budget") - F.col("prefix")).cast("double")
                / (F.col("n") - F.col("i") + 1).cast("double")
            ).alias("t")
        )
    )
    alloc = F.when(
        F.col("capped"), F.col("cap").cast("double")
    ).otherwise(F.col("t"))
    return (
        flag.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            "lang",
            F.col("s").alias("n_tokens"),
            F.col("cap").alias("capacity"),
            "capped",
            r6(alloc).alias("alloc"),
            r6(alloc / F.col("s").cast("double")).alias("epochs"),
        )
    )


@register(
    "q_text_collocations",
    oracle=f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ), uni AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c1
            FROM (SELECT unnest(t) AS tok FROM toks)
            GROUP BY 1
        ), bi AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM (
                SELECT t.t[u.gs] AS w1, t.t[u.gs + 1] AS w2
                FROM toks t,
                     LATERAL (SELECT unnest(generate_series(1, len(t.t) - 1))
                              AS gs) u
            )
            GROUP BY 1, 2
            HAVING count(*) >= {_MIN_PAIR}
        ), tot AS (
            -- One scalar per source relation: a joint FROM uni, toks would
            -- be a cartesian product that multiplies nu by |docs| and nb
            -- by |vocab| (ADVICE r8).
            SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS nu,
                   (SELECT CAST(sum(len(t) - 1) AS BIGINT) FROM toks) AS nb
        )
        SELECT b.w1, b.w2, b.c12 AS n_pair,
               round(ln(CAST(b.c12 AS DOUBLE) * CAST(tot.nu AS DOUBLE)
                        * CAST(tot.nu AS DOUBLE)
                        / (CAST(tot.nb AS DOUBLE) * CAST(u1.c1 AS DOUBLE)
                           * CAST(u2.c1 AS DOUBLE))), 6) AS pmi
        FROM bi b
        JOIN uni u1 ON b.w1 = u1.tok
        JOIN uni u2 ON b.w2 = u2.tok
        CROSS JOIN tot
    """,
    origin="LLM",
    doc="PMI collocation extraction over corpus word bigrams (Church & "
        f"Hanks): adjacent-token pairs with support ≥ {_MIN_PAIR} scored "
        "by ln(P(w1,w2)/(P(w1)P(w2))) with P̂s from exact BIGINT unigram/"
        "bigram counts — PMI is ONE ln() over one double ratio of five "
        "exact integers, 6-dp on identical trees (not a sum of ln()s, "
        "whose association order could differ cross-engine). The support "
        "threshold is simultaneously the statistical guard (PMI explodes "
        "on hapax pairs) and the output bound (≤ N_bigrams/"
        f"{_MIN_PAIR} rows). Scale shape: ONE corpus scan feeds the "
        "unigram and bigram map-side-combined aggregates; the two "
        "probability lookups are hash equi joins on the token key "
        "(shuffle ∝ surviving bigrams, never all-pairs); totals fold to "
        "one broadcast row.",
)
def q_text_collocations(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select(toks.alias("t"))
    uni = (
        base.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # Same guarded adjacent-pair construction as q_text_ngrams: a 1-token
    # doc must yield no pairs (sequence(1, 0) would descend).
    pairs = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("w1"),
                F.element_at("t", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        base.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= _MIN_PAIR)
    )
    tot = base.agg(
        F.sum(F.size("t")).cast("long").alias("nu"),
        F.sum(F.size("t") - 1).cast("long").alias("nb"),
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1_1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_2"))
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("n_pair"),
            r6(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("nu").cast("double")
                    * F.col("nu").cast("double")
                    / (
                        F.col("nb").cast("double")
                        * F.col("c1_1").cast("double")
                        * F.col("c1_2").cast("double")
                    )
                )
            ).alias("pmi"),
        )
    )


@register(
    "q_source_vocab_overlap",
    oracle="""
        WITH v AS (
            SELECT DISTINCT source, tok
            FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
        ), sz AS (
            SELECT source, CAST(count(*) AS BIGINT) AS nv FROM v GROUP BY 1
        ), ix AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS inter
            FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT sa.source AS src_a, sb.source AS src_b,
               sa.nv AS vocab_a, sb.nv AS vocab_b,
               coalesce(ix.inter, 0) AS intersection,
               round(CAST(coalesce(ix.inter, 0) AS DOUBLE)
                     / CAST(sa.nv + sb.nv - coalesce(ix.inter, 0)
                            AS DOUBLE), 6) AS jaccard
        FROM sz sa JOIN sz sb ON sa.source < sb.source
        LEFT JOIN ix ON ix.src_a = sa.source AND ix.src_b = sb.source
    """,
    origin="LLM",
    doc="Pairwise Jaccard overlap of per-source vocabularies — the "
        "lexical mirror detector that runs BEFORE content-level dedup: "
        "two sources with near-1 vocabulary Jaccard are almost certainly "
        "the same crawl twice. Vocabulary = DISTINCT (source, token) off "
        "one corpus scan; the intersection is an equi join ON THE TOKEN "
        "KEY between the two vocab sides (shuffle ∝ shared vocabulary — "
        "never a doc- or pair-level cross join), oriented src_a < src_b "
        "so each pair counts once. The |sources|² pair grid is built "
        "from the bounded size table and left-joined so zero-overlap "
        "pairs still report 0. Exact BIGINT set sizes; Jaccard is ONE "
        "6-dp division via |A∪B| = |A|+|B|−|A∩B|.",
)
def q_source_vocab_overlap(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    v = (
        d.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        ).distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = v.select(F.col("source").alias("src_a"), "tok")
    b = v.select(F.col("source").alias("src_b"), "tok")
    ix = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("nv").alias("vocab_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("nv").alias("vocab_b"))
    grid = sa.crossJoin(F.broadcast(sb)).where(F.col("src_a") < F.col("src_b"))
    inter = F.coalesce(F.col("inter"), F.lit(0)).cast("long")
    return (
        grid.join(F.broadcast(ix), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "vocab_a",
            "vocab_b",
            inter.alias("intersection"),
            r6(
                inter.cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - inter).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "q_corpus_report",
    oracle="""
        WITH g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS total_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM documents
        ), l AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS c,
                   row_number() OVER (ORDER BY count(*) DESC, lang) AS rn
            FROM documents GROUP BY lang
        )
        SELECT g.n_docs, g.n_sources, g.n_langs, g.total_tokens,
               g.total_chars,
               round(CAST(g.total_tokens AS DOUBLE)
                     / CAST(g.n_docs AS DOUBLE), 6) AS mean_doc_tokens,
               round(1.0 - CAST(g.n_uniq AS DOUBLE)
                     / CAST(g.n_docs AS DOUBLE), 6) AS exact_dup_rate,
               l.lang AS top_lang,
               round(CAST(l.c AS DOUBLE) / CAST(g.n_docs AS DOUBLE), 6)
                   AS top_lang_share
        FROM g CROSS JOIN (SELECT lang, c FROM l WHERE rn = 1) l
    """,
    origin="LLM",
    doc="Corpus datasheet — the one-row health report (Datasheets for "
        "Datasets / DataComp reporting convention) a pipeline publishes "
        "with every data drop: document/source/language cardinalities, "
        "exact token and char volumes, mean document length, the "
        "md5-exact duplicate rate, and the dominant language with its "
        "share ((count DESC, lang) tie-break — deterministic on any "
        "engine). Complements q_corpus_funnel (stage attrition) with "
        "the absolute inventory numbers. Scale shape: ONE corpus scan "
        "feeds a single global multi-distinct aggregate (Spark expands "
        "multi-distinct into one Expand + two-level aggregate — no "
        "extra scan) plus a |langs|-row sub-aggregate; both fold to "
        "1-row broadcasts.",
)
def q_corpus_report(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    g = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("n_uniq"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias(
            "total_tokens"
        ),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    w = Window.orderBy(F.col("c").desc(), "lang")
    top = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("lang").alias("top_lang"), F.col("c").alias("tc"))
    )
    return g.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        "total_chars",
        r6(
            F.col("total_tokens").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("mean_doc_tokens"),
        r6(
            1.0
            - F.col("n_uniq").cast("double") / F.col("n_docs").cast("double")
        ).alias("exact_dup_rate"),
        "top_lang",
        r6(
            F.col("tc").cast("double") / F.col("n_docs").cast("double")
        ).alias("top_lang_share"),
    )
