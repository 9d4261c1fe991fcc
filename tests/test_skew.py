"""Skew-handling evidence: the synthetic corpus really is Zipf-skewed and the
explicitly-salted plans produce identical results to the unsalted ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from generative_ner_spark.operators import detect, linking
from generative_ner_spark.sources import corpus
from generative_ner_spark.sources.synth import SynthConfig

CFG = SynthConfig(n_docs=300)


def test_corpus_has_hub_entities(spark):
    """FIXTURES.md F1: Zipf-skewed hub entities — the hottest alias key must
    carry a disproportionate share of mentions (what salting/AQE exist for)."""
    ex = corpus.synth_examples_with_golds(spark, CFG, num_partitions=4)
    m = detect.detect_mentions_fused(ex, CFG)
    linked = linking.link_mentions(m, corpus.alias_df(spark, CFG))
    counts = (
        linked.groupBy("entity_id").count().orderBy(F.desc("count")).limit(5).collect()
    )
    total = linked.count()
    top_share = counts[0]["count"] / total
    assert top_share > 0.05, f"top entity share {top_share:.3f} — corpus not skewed"
    # skew factor: hottest key vs mean key frequency
    n_keys = linked.select("entity_id").distinct().count()
    assert counts[0]["count"] > 5 * total / n_keys


def test_salted_two_phase_agg_equals_plain(spark):
    """Salted partial aggregation (hot-key mitigation) == plain groupBy."""
    ex = corpus.synth_examples_with_golds(spark, CFG, num_partitions=4)
    m = detect.detect_mentions_fused(ex, CFG).persist()
    plain = {
        (r.label, r["count"]) for r in m.groupBy("label").count().collect()
    }
    salted = (
        m.withColumn("_salt", F.pmod(F.xxhash64("example_id"), F.lit(16)))
        .groupBy("label", "_salt")
        .agg(F.count("*").alias("c"))
        .groupBy("label")
        .agg(F.sum("c").alias("count"))
    )
    assert {(r.label, r["count"]) for r in salted.collect()} == plain
    m.unpersist()


def test_domain_stats_absorbs_planted_hot_domain(spark):
    """r4 VERDICT #7: web corpora have heavy-hitter domains — plant one
    domain on 50% of all URLs and pin that (a) the agg runs with a
    map-side partial (the reduce side sees per-partition partials, not
    the raw hot-key rows) and (b) output is identical under different
    shuffle.partitions (no accidental partition-count sensitivity)."""
    from generative_ner_spark.operators import urls

    rows = []
    for i in range(2000):
        if i % 2 == 0:
            dom = "hot.example.com"          # 50% of all URLs
        else:
            dom = f"d{i % 400}.example.org"  # long tail
        rows.append((i, f"text {i} see https://{dom}/p/{i} end"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = urls.domain_stats(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan[:2000]

    def snap():
        return {(r.domain, r.n_urls, r.n_docs)
                for r in urls.domain_stats(df).collect()}

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = snap()
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = snap()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert a == b
    assert ("hot.example.com", 1000, 1000) in a
    # odd doc_ids only hit odd residues -> 200 tail domains + the hot one
    assert len(a) == 201
