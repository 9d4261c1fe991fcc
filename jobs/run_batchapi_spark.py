"""spark-submit entry point mirroring the reference's run_batchapi.py.

Reference (src/cli/run_batchapi.py): download finished Batch-API result
files, then re-attach generations to inputs PURELY BY FILE ORDER
(``all_generations.pop(0)``) — correct only if the retrieval run iterates
the dataset in exactly the submit run's order. This restatement joins BY
KEY (custom_id -> example_id[#label]) so retrieval is order-safe and
resumable, then runs the same parse -> ground -> micro P/R/F1 tail:

    spark-submit --master local[8] --py-files dist/generative_ner_spark.zip \
        jobs/run_batchapi_spark.py --input synth:200 --format collective \
        --tasks /out/batch --results /out/batch_results --output /out/score

``--tasks`` is the task-file dir written by ``run_gpt_spark.py --mode
batch``. ``--results`` is the downloaded Batch-API output JSONL
(custom_id, generated_text); pass ``--simulate`` to synthesize results
locally with the deterministic heuristic responder (no network here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Iterator


def _simulate_results(tasks, responder):
    """Run a responder over task bodies -> (custom_id, generated_text)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"custom_id": [], "generated_text": []}
            for cid, body in zip(pdf["custom_id"], pdf["body"]):
                messages = [
                    {"role": m["role"], "content": m["content"]}
                    for m in body["messages"]
                ]
                text, _finish = responder(messages, {})
                out["custom_id"].append(cid)
                out["generated_text"].append(text)
            yield pd.DataFrame(out)

    return tasks.mapInPandas(
        fn, "custom_id string, generated_text string"
    ).repartition(7)  # scramble order on purpose: the join must not care


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="run_batchapi.py, Spark-first")
    ap.add_argument("--input", required=True,
                    help="synth:<n_docs> or JSONL dir of interleaved docs")
    ap.add_argument("--golds", default=None)
    ap.add_argument("--format", default="collective",
                    choices=["collective", "universal", "individual"])
    ap.add_argument("--tasks", required=True,
                    help="task-file dir from run_gpt_spark --mode batch")
    ap.add_argument("--results", default=None,
                    help="downloaded Batch-API results JSONL dir")
    ap.add_argument("--simulate", action="store_true",
                    help="synthesize results locally (sandbox; no network)")
    ap.add_argument("--local-control-plane", action="store_true",
                    help="drive the FULL S19 flow (upload -> create batch "
                         "-> persist batch_id_list.jsonl -> poll to "
                         "terminal -> download output files) against the "
                         "deterministic file-backed client; the real "
                         "OpenAI client slots into the same protocol")
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("run-batchapi").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from generative_ner_spark.operators import batchapi, detect, evaluate, syncgen
    from generative_ner_spark.sources.examples import build_examples

    examples, golds, _ = build_examples(spark, args.input, args.golds)
    tasks = spark.read.json(args.tasks)
    if args.local_control_plane:
        work = os.path.join(args.output, "control_plane")
        client = batchapi.LocalBatchClient(
            work, responder=syncgen.heuristic_ner_responder)
        state = os.path.join(work, "batch_id_list.jsonl")
        batchapi.submit_batches(client, args.tasks, state)
        statuses = batchapi.poll_batches(client, state)
        results = batchapi.retrieve_batches(
            spark, client, state, os.path.join(work, "downloads"),
            statuses=statuses)
    elif args.simulate:
        results = _simulate_results(tasks, syncgen.heuristic_ner_responder)
    elif args.results:
        results = spark.read.json(args.results).select(
            "custom_id", "generated_text")
    else:
        raise SystemExit("pass --results <dir> or --simulate")

    joined = batchapi.join_results(
        tasks.select("custom_id", "example_id"), results
    ).withColumn("label", F.get(F.split("example_id", "#"), 1)) \
     .withColumn("example_id", F.get(F.split("example_id", "#"), 0))
    keyed = examples.select("example_id", "doc_id", "span_offset", "text").join(
        joined, "example_id"
    )
    # keyed feeds three actions (metrics collect, predictions write,
    # n_results count) — persist so the responder/ground mapInPandas
    # stages run once (CLAUDE.md: materialize frames feeding branches)
    keyed = keyed.persist()
    if args.format == "individual":
        mentions = detect.ground_individual(keyed)
    else:
        mentions = detect.ground(keyed)
    mentions = mentions.persist()
    metrics = evaluate.evaluate_predictions(
        evaluate.mention_eval_frame(mentions, golds)
    )
    preds_path = os.path.join(args.output, "predictions")
    (
        keyed.select("example_id", "text", "generated_text")
        .join(
            mentions.groupBy("example_id").agg(
                F.collect_list(F.struct("start", "end", "label")).alias("preds")
            ),
            "example_id", "left",
        )
        .write.mode("overwrite").parquet(preds_path)
    )
    n_results = keyed.count()  # served results (keyed is cached)
    print(json.dumps({"mode": "batch-retrieve", "metrics": metrics,
                      "predictions": preds_path,
                      "n_results": n_results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
