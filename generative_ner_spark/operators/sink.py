"""Output-document sink (S27): re-attach predictions to the input documents.

Reference: convert_predictions_to_json (/root/reference/src/prediction/
pred.py:133-150) groups preds by example id and adds a ``predictions`` field
per example; the document structure — including media spans — is otherwise
UNCHANGED. This operator is where the north rule's per-row span-sequence
invariant (kind, text, media_ref, order) is proven: the output carries the
original ``spans`` array untouched.

Spark restatement: groupBy(doc_id, span_offset) collect preds -> regroup to
doc level -> single equi-join back to docs. Two shuffles on high-cardinality
keys, no skew (preds per doc are bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_predictions(docs: DataFrame, mentions: DataFrame) -> DataFrame:
    """docs(doc_id, spans) + mentions -> docs + predictions array.

    ``predictions``: array<struct<span_offset,start,end,label>> sorted by
    (span_offset, start, end, label) for determinism; empty array when the
    doc produced no mentions (parity: reference emits [] too, pred.py:146).
    """
    per_doc = (
        mentions.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_offset", "start", "end", "label"))
            ).alias("predictions")
        )
    )
    empty = F.array().cast(
        "array<struct<span_offset:int,start:bigint,end:bigint,label:string>>"
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "spans",
            F.coalesce("predictions", empty).alias("predictions"),
        )
    )
