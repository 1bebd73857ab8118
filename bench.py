"""Headline benchmark (SURVEY §6/§7 step 10).

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]``; per query: 1 warmup + MIN of 3 timed runs,
result fully materialized. Min (not median) because the shared host shows
40% run-to-run variance on identical binaries (r5 measured three identical
full-bench totals of 63.6/88.6/49.4 s): under purely-additive external
interference the minimum is the estimator closest to true machine capability.
The DuckDB baseline (tools/measure_baseline.py) uses the SAME estimator, so
the comparison stays symmetric. Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

The headline set spans every subsystem (scan, agg, join, window, top-k, XML
envelope, streaming-batch, text, dedup, vectors, pandas UDF) while staying
at its 100 TB-shaped formulation — no quadratic ops (the exact-Jaccard and
all-pairs-cosine ground truths are correctness-only; their scale paths
E-MINHASH-LSH and E-EMB-LSH bench instead).

The total appears twice in the JSON line — as ``value`` (first key) and
``total_sec`` (last key) — so a driver that captures only the head or only
the tail of stdout still records it (BENCH_r05 lost the head to a
2,000-char tail capture).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_scan_pruned",
    "q_agg_group",
    "q_agg_count_distinct",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_rownum",
    "q_win_running",
    "q_limit_topn",
    "q_topk_per_group",
    "q_xml_parse_struct",
    "q_xml_nested_explode",
    "q_stream_tumbling",
    "q_stream_session",
    "q_text_tfidf",
    "q_text_wordcount",
    "q_dedup_exact",
    "E-MINHASH-LSH",
    "q_knn_cosine",
    "q_udf_pandas",
    # Training-data-pipeline operators (BASELINE.json mandate) — each has a
    # DuckDB twin in measure_baseline except E-KNN-IVF and E-EMB-LSH
    # (rows-only engine keys).
    "q_text_quality",
    "q_text_langid",
    "q_text_token_stats",
    "q_text_fingerprint",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    # q_dedup_emb_cosine is the all-pairs exact-truth twin (correctness
    # only); its scale path E-EMB-LSH (sign-LSH banded equi join) benches
    # as the representative so the set keeps its no-quadratic-ops claim.
    "E-EMB-LSH",
    # Realistic-τ scale path (r7): tight band family, ~5e-4 candidate
    # fraction — the shape that actually runs at 100 TB.
    "E-EMB-LSH-HI",
    "E-KNN-IVF",
    "q_text_chunk",
    "q_text_repetition",
    "q_sample_hash",
    # r4 additions: scale-path joins (salt/bucket), file-source roundtrips,
    # packing + segment dedup. Bucketed-join timing excludes the one-time
    # bucket write (it happens in the warmup run and the tables are reused).
    "q_join_salted",
    "q_join_bucketed",
    "q_src_csv_roundtrip",
    "q_src_json_roundtrip",
    "q_text_pack",
    "q_dedup_segment",
    # r4 additions, second batch: multimodal metadata, portable MinHash
    # signatures, shard manifest, char entropy, and the wider TPC-H shapes.
    "q_mm_meta",
    "q_minhash_sig",
    "q_shard_assign",
    "q_text_entropy",
    "q_tpch_q7",
    "q_tpch_q10",
    "q_tpch_q12",
    # r4 additions, third batch: warehouse maintenance (CDC/SCD2), lateral
    # top-k, single-scan profiling, ORC roundtrip, deterministic mode.
    "q_cdc_upsert",
    "q_scd2_intervals",
    "q_lateral_topn",
    "q_profile_stats",
    "q_src_orc_roundtrip",
    "q_agg_mode",
    # r4 additions, fourth batch: containment dedup, two-level rollup,
    # gap filling, LM scoring, quantization, transitions.
    "q_dedup_containment",
    "q_rollup_two_level",
    "q_gapfill",
    "q_text_bigram_logprob",
    "q_emb_quantize",
    "q_events_transitions",
    # r4 additions, fifth batch: the remaining TPC-H shapes and the
    # lake-maintenance / sketch operators.
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_join_bloom",
    "q_zonemap",
    # r6 addition: Z-order clustering manifest (lake-layout family).
    "q_zorder_manifest",
    "q_incremental_agg",
    "q_resample_ohlc",
    "q_heavy_hitters",
    # r4 additions, sixth batch: LSH-estimate pipeline, survivor policy,
    # XML error-mode source, JSON flatten, salted skew aggregation.
    "q_minhash_est",
    "q_dedup_keep_best",
    "q_src_xml_dropmalformed",
    "q_json_flatten",
    "q_agg_salted_skew",
    "q_xml_namespaces",
    "q_dq_checks",
    "q_join_dpp",
    "q_win_nth_value",
    "q_agg_bool_bit",
    "q_emb_gram",
    "q_tpch_q20",
    # r5 additions: the last TPC-H shapes and exact span dedup (the real
    # Q1 lands in the r7 batch below).
    "q_tpch_q2",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_dedup_spans",
    "E-EMB-PQ",
    "q_join_fuzzy",
    "q_text_bm25",
    # r7 additions: prefix dedup, rule-based quality gate, compaction
    # planner, and the SCD2 point-in-interval lookup.
    "q_dedup_prefix",
    "q_quality_rules",
    "q_compaction_plan",
    "q_join_interval",
    "q_ppl_bucket",
    "q_orders_rfm",
    "q_src_text_lines",
    "q_dedup_degree",
    "q_sketch_cms",
    # r7 additions, second batch: real TPC-H Q1 (the suite's 22/22 row),
    # single-pass feature-correlation matrix, windowed skyline, cohort
    # revenue matrix.
    "q_tpch_q1",
    "q_agg_corr_matrix",
    "q_part_skyline",
    "q_orders_cohort",
    # r7 additions, third batch: batch sessionization, z-score anomaly
    # scan, Zipf corpus fit, similarity histogram.
    "q_events_sessionize",
    "q_events_anomaly",
    "q_text_zipf",
    "q_emb_cosine_hist",
    # r7 additions, fourth batch: triangle census, hive-partitioned
    # source, tolerance as-of join.
    "q_graph_triangles",
    "q_src_hive_partitioned",
    "q_join_asof_tolerance",
    # r7 additions, fifth batch: market-basket affinity, order backlog,
    # conversion delay, EWMA, and late-interaction MaxSim.
    "q_orders_basket",
    "q_orders_backlog",
    "q_events_convert",
    "q_events_ewma",
    "q_emb_maxsim",
    # r7 additions, sixth batch: TWAP, weekly seasonality, PageRank,
    # keyword extraction, dup-rate KPI.
    "q_events_twap",
    "q_events_dow_profile",
    "q_graph_pagerank",
    "q_text_keywords",
    "q_docs_dup_rate",
    # r7 additions, seventh batch: ABC classification, churn histogram,
    # readability, embedding outliers.
    "q_orders_abc",
    "q_events_churn",
    "q_text_readability",
    "q_emb_outliers",
    # r7 additions, eighth batch: Markov stationary mix, PMI co-occurrence.
    "q_events_markov",
    "q_events_pmi",
    # r7 additions, ninth batch: the drift/statistics layer — the
    # representative heavier shapes (the many ≤9-row micro-aggregates in
    # this family are oracle-checked but not headlined: they'd measure
    # only the documented ~0.3-0.5 s PySpark per-query floor).
    "q_trend_ols",
    "q_text_lang_confusion",
    "q_text_simpson",
    "q_text_js_divergence",
    "q_kmv_union",
    "q_fk_orphans",
    "q_spend_gini",
    "q_cust_iqr",
    "q_orders_interarrival",
    "q_dedup_url_canon",
    # r7 additions, tenth batch: the heavyweight LLM-curation trio — all
    # three stream real corpus volume through the plan (k-means Lloyd
    # rounds, winnowing window selection, segment scrub + reconstruction).
    "q_emb_kmeans",
    "q_text_winnowing",
    "q_dedup_scrub",
    # r9 additions: censoring-aware survival + CLV denominators (orders
    # volume) and the two corpus-lexical heavyweights (token-level joins
    # over the full documents scan).
    "q_cust_kaplan_meier",
    "q_cust_lifetime",
    "q_text_collocations",
    "q_source_vocab_overlap",
    # r9 additions, second batch: the two published-recipe curation ops —
    # SemDeDup within-cluster pairing and DSIR hashed-bigram importance
    # weights (both stream the full corpus/vector volume).
    "q_dedup_semantic",
    "q_text_dsir",
    "q_dedup_lsh_buckets",
    "q_corpus_budget_fill",
    # r9 additions, third batch: UniMax domain allocation (bounded-table
    # water-filling off one corpus scan) and incremental batch-vs-index
    # dedup (token-blocked join, new side only).
    "q_domain_unimax",
    "q_dedup_incremental",
    "q_emb_hard_negatives",
    "q_domain_temperature",
    "q_emb_knn_graph",
    "q_part_price_elasticity",
    "q_events_paths",
    "q_cust_seg_migration",
    "q_events_attribution_linear",
    "q_supplier_scorecard",
    "q_orders_gmv_bridge",
    "q_xml_validate",
    "q_brand_abc_xyz",
    "q_events_bot_regularity",
    "q_join_asof_forward",
    "q_text_hash_features",
    "q_corpus_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from xml_processor_spark.registry import get_queries
    from xml_processor_spark.session import build_session

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        fn = queries[key]
        # Materialize via toPandas(): full result lands in driver Python
        # memory through Arrow batches — the vectorized twin of DuckDB's
        # C-level fetchall() in tools/measure_baseline.py. Row-at-a-time
        # collect() would time pickle deserialization, not the engine
        # (measured: 3.9s -> 0.6s on a 600k-row result, identical plan).
        fn(spark, sf_dir).toPandas()  # warmup (JIT, file listing, broadcast)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        timings[key] = round(min(runs), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "total_sec": total,
            }
        )
    )
    # The full line above is ~4.3 kB (168 per-query timings) and the driver
    # captures only a 2,000-char stdout tail, so its head — and the JSON
    # opening brace — is lost and the per-query parse fails (PERF r14/r15
    # "n_common": 0). Observability addition (VERDICT r15 #2, output
    # additions only — the full line above and the compact summary line
    # below are unchanged): re-emit each timing as its own complete
    # ~40-char JSON line {"q": key, "s": sec}, sorted ascending so the
    # SLOWEST keys sit last — the region any tail capture keeps intact.
    # These lines carry no "queries" field, so a parser hunting for the
    # full map can never mistake a truncated subset for it.
    for key in sorted(timings, key=timings.get):
        print(json.dumps({"q": key, "s": timings[key]},
                         separators=(",", ":")))
    # This final line is < 200 chars, complete inside any tail capture,
    # and is the LAST line, so a last-line JSON parse succeeds regardless
    # of truncation (VERDICT r6 #5).
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "total_sec": total,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
