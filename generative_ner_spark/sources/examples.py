"""Shared CLI input builder: ``synth:<n>`` or JSONL+golds -> examples.

Lives INSIDE the package (not in jobs/) deliberately: the spark-submit
deployment ships only ``dist/generative_ner_spark.zip`` via --py-files and
the driver script's sys.path[0] is the jobs/ directory, so a
``from jobs.run_gpt_spark import ...`` in another job raises
ModuleNotFoundError under the documented deployment — it only worked under
pytest, which puts the repo root on sys.path.
"""

from __future__ import annotations


def build_examples(spark, input_spec: str, golds_path: str | None = None):
    """(examples_with_golds, golds_df, cfg|None) from ``synth:<n_docs>``
    or a JSONL dir of interleaved documents plus a golds parquet."""
    from generative_ner_spark.operators import detect
    from generative_ner_spark.sources import corpus, io
    from generative_ner_spark.sources.synth import SynthConfig

    if input_spec.startswith("synth:"):
        cfg = SynthConfig(n_docs=int(input_spec.split(":", 1)[1]))
        docs, golds = corpus.synth_documents(spark, cfg)
        examples = detect.attach_golds(detect.explode_text_spans(docs), golds)
        return examples, golds, cfg
    docs = io.load_documents_json(spark, input_spec)
    if not golds_path:
        raise SystemExit("--golds is required with a JSONL --input")
    golds = spark.read.parquet(golds_path)
    examples = detect.attach_golds(detect.explode_text_spans(docs), golds)
    return examples, golds, None
