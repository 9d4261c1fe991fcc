"""Micro P/R/F1 evaluation as a Spark aggregation (S28).

Reference math: /root/reference/src/evaluation/eval.py:6-27 — per record,
set-dedup golds and preds, count exact (start,end,label) intersections,
global sums, nan on zero denominators. Expressed with array built-ins
(array_distinct / array_intersect / size) so the whole reduction is
JVM-side whole-stage-codegen + one global agg — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from generative_ner_spark.functions.textops import calculate_metrics


def evaluate_predictions(pred_vs_gold: DataFrame,
                         golds_col: str = "golds",
                         preds_col: str = "preds") -> dict[str, float]:
    """df with two array<struct<start,end,label>> columns -> micro P/R/F1.

    One narrow projection + one global agg; at 100 TB this is a single
    map-side-combined reduction (no per-key shuffle at all).
    """
    # NULL arrays count as EMPTY on that side, not as a silently skipped
    # row: size(NULL) is NULL under ANSI and F.sum would drop it from the
    # denominators, shrinking precision/recall without warning for any
    # caller whose frame wasn't built by mention_eval_frame (e.g. a left
    # join that missed); coalescing makes a NULL preds row count its gold
    # spans as misses, the semantics the reference's set-math implies
    empty = F.expr("array()").cast(
        "array<struct<start:bigint,end:bigint,label:string>>")
    g = F.array_distinct(F.coalesce(F.col(golds_col), empty))
    p = F.array_distinct(F.coalesce(F.col(preds_col), empty))
    row = (
        pred_vs_gold.select(
            F.size(g).alias("n_gold"),
            F.size(p).alias("n_pred"),
            F.size(F.array_intersect(p, g)).alias("n_correct"),
        )
        .agg(
            F.sum("n_gold").alias("gold"),
            F.sum("n_pred").alias("pred"),
            F.sum("n_correct").alias("correct"),
        )
        .collect()[0]
    )
    n_gold = row["gold"] or 0
    n_pred = row["pred"] or 0
    n_correct = row["correct"] or 0
    precision, recall, f1 = calculate_metrics(n_correct, n_pred, n_gold)
    return {"precision": precision, "recall": recall, "f1": f1,
            "n_gold": n_gold, "n_pred": n_pred, "n_correct": n_correct}


def mention_eval_frame(mentions: DataFrame, golds: DataFrame) -> DataFrame:
    """Join grounded mentions vs gold spans into per-example (golds, preds)
    arrays — the reference's prediction-record shape (pred.py:55)."""
    p = mentions.groupBy("doc_id", "span_offset").agg(
        F.collect_list(F.struct("start", "end", "label")).alias("preds")
    )
    g = golds.groupBy("doc_id", "span_offset").agg(
        F.collect_list(F.struct("start", "end", "label")).alias("golds")
    )
    empty = "array()"
    return (
        g.join(p, ["doc_id", "span_offset"], "full")
        .select(
            "doc_id",
            "span_offset",
            F.coalesce("golds", F.expr(empty).cast(
                "array<struct<start:bigint,end:bigint,label:string>>")).alias("golds"),
            F.coalesce("preds", F.expr(empty).cast(
                "array<struct<start:bigint,end:bigint,label:string>>")).alias("preds"),
        )
    )
