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
