"""spark-submit entry point mirroring the reference's scripts/conll2003.py.

The reference converter downloads CoNLL-2003 via HF datasets and writes one
document-JSONL per split (scripts/conll2003.py:198-222). This restatement
takes the raw CoNLL text files (the sandbox has no network / HF cache) and
runs the DISTRIBUTED ingestion (sources/conll.py: window running-groups +
the byte-parity decode kernel) — one output JSONL dir per split:

    spark-submit --master local[8] --py-files dist/generative_ner_spark.zip \
        jobs/convert_conll.py \
        --split train=eng.train --split validation=eng.testa \
        --split test=eng.testb --output /data/conll_jsonl

Each output record is the reference's document shape
(doc_id, examples[{id, text, entities, word_positions}]), so the converted
corpus feeds jobs/run_gpt_spark.py and the pipeline unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="CoNLL-2003 -> document JSONL")
    ap.add_argument("--split", action="append", required=True,
                    metavar="NAME=PATH",
                    help="split name and raw CoNLL file/dir, repeatable")
    ap.add_argument("--output", "-o", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("convert-conll").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from generative_ner_spark.sources.conll import read_conll_distributed

    summary = {}
    for spec in args.split:
        if "=" not in spec:
            ap.error(f"--split expects NAME=PATH, got {spec!r}")
        name, path = spec.split("=", 1)
        docs = read_conll_distributed(spark, path)
        out = os.path.join(args.output, name)
        docs.write.mode("overwrite").json(out)
        summary[name] = spark.read.json(out).count()
    print(json.dumps({"output": args.output, "documents": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
