"""Frequency-sketch operators (SURVEY §2.K extension).

`q_heavy_hitters` is the two-pass exact heavy-hitters pattern for corpora
whose distinct-term set does NOT fit in an aggregation hash table — the
regime a 100 TB token stream lives in, where the one-shot
``groupBy(term).count()`` of `q_text_wordcount` would spill:

- **Pass 1 (sketch)**: each partition runs a Misra–Gries summary with
  ``_MG_CAP`` counters over its token stream (Arrow-batched via
  ``mapInPandas``; state is per-partition, memory is O(cap) regardless of
  partition size). MG guarantees any term with partition frequency
  > n_p/cap survives that partition's summary, so by pigeonhole any term
  with GLOBAL frequency > N/cap survives in at least one partition — the
  candidate union is a guaranteed superset of the true top-k for any
  k ≤ cap/skew.
- **Pass 2 (exact recount)**: the candidate set (≤ cap × partitions terms,
  tiny) is broadcast back and ONLY candidate terms are exactly recounted
  and ranked. The output is therefore exact, not approximate — the sketch
  only bounds the candidate set.

Determinism: the token stream is hash-repartitioned by doc_id into a fixed
partition count and sorted within partitions, so each partition processes
an identical ordered stream regardless of input splits or cluster size —
the candidate set (and hence the result) is reproducible, which is what
makes the key oracle-checkable rather than rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from xml_processor_spark.io import table
from xml_processor_spark.registry import register

_MG_CAP = 400  # counters per partition
_MG_PARTS = 16  # fixed partition count (determinism, not tuning)
_TOP_K = 20


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra–Gries over one partition's token stream; emits the surviving
    (term, lower_bound) counters once, after the last Arrow batch."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for term in pdf["term"]:
            if term in counters:
                counters[term] += 1
            elif len(counters) < _MG_CAP:
                counters[term] = 1
            else:
                # decrement-all; drop zeros (the classic MG step)
                dead = []
                for t in counters:
                    counters[t] -= 1
                    if counters[t] == 0:
                        dead.append(t)
                for t in dead:
                    del counters[t]
    yield pd.DataFrame(
        {"term": list(counters), "lb": list(counters.values())}
    )


@register(
    "q_heavy_hitters",
    oracle=f"""
        SELECT term, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY term
        ORDER BY n DESC, term
        LIMIT {_TOP_K}
    """,
    origin="LLM",
    doc="Two-pass exact heavy hitters: per-partition Misra-Gries sketch "
        "(O(cap) memory however large the partition) unions into a "
        "guaranteed-superset candidate set; only candidates are exactly "
        "recounted and ranked. Equals the full groupBy top-k (the oracle) "
        "whenever true top-k frequency > N/cap — the property "
        "tests/test_llm.py asserts directly. The scale story: pass 1 "
        "never shuffles token-cardinality data, pass 2 shuffles only "
        "|candidates| partial counts.",
)
def q_heavy_hitters(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tokens = (
        docs.repartition(_MG_PARTS, "doc_id")
        .sortWithinPartitions("doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    candidates = (
        tokens.mapInPandas(_mg_summaries, schema="term string, lb long")
        .select("term")
        .distinct()
    )
    return (
        tokens.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(_TOP_K)
    )
