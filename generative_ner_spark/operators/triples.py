"""(subj, pred, obj) triple materialization + partitioned sink (north rule).

Triple semantics (shared with the pure-Python oracle in tests):

  * typing triple     : (canon(entity), 'instance_of', entity_type) once per
                        linked mention occurrence's (doc, span) — dedup'd per
                        (subj, obj, doc, span).
  * co-occurrence     : for each text span, the SORTED DISTINCT canonical ids
                        mentioned in it; every pair a < b emits
                        (a, 'co_occurs_with', b).

Lineage: every triple carries (doc_id, span_offset, partition_id) — the
north rule's per-partition lineage. Sink: parquet partitioned by ``pred``
(Iceberg-shaped layout; an Iceberg catalog slots in by swapping
``.format("iceberg")`` — the sandbox has no catalog, so we add a snapshot
manifest JSON for checkpoint/resume instead, see plans/pipeline.py).

Scale notes: the co-occurrence groupBy shuffles on (doc_id, span_offset) —
high-cardinality keys, no skew risk (a span holds only a handful of
mentions). The pair explosion is bounded by per-span mention counts. Writing
partitionBy("pred") gives partition pruning for per-predicate consumers; at
real scale add a bucket on subj_id inside each pred partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRIPLES_EXPR = """
concat(
  transform(typed, t -> struct(t.canonical_id AS subj_id,
                               'instance_of' AS pred,
                               t.entity_type AS obj_id)),
  flatten(
    transform(ids, (x, i) ->
      transform(slice(ids, i + 2, size(ids) - i - 1),
                y -> struct(x AS subj_id, 'co_occurs_with' AS pred,
                            y AS obj_id))
    )
  )
)
"""


def materialize_triples(linked_mentions: DataFrame) -> DataFrame:
    """linked mentions (with canonical_id, entity_type) -> triple DataFrame.

    BOTH triple kinds come out of ONE groupBy + ONE explode: per (doc, span)
    group, the typing triples (distinct (canon, type)) and the co-occurrence
    pairs (sorted distinct canon ids, all a < b) are built as arrays and
    concatenated before a single explode. One shuffle total, linked read
    exactly once — the earlier two-branch union read the mention stream
    twice (forcing a persist) and paid a dropDuplicates shuffle for typing
    dedup that collect_set now does inside the aggregate.
    """
    grouped = (
        linked_mentions.groupBy("doc_id", "span_offset")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("canonical_id", "entity_type"))
            ).alias("typed"),
            F.sort_array(F.collect_set("canonical_id")).alias("ids"),
        )
    )
    return (
        grouped.select(
            "doc_id", "span_offset", F.explode(F.expr(_TRIPLES_EXPR)).alias("t")
        )
        .select(
            F.col("t.subj_id").alias("subj_id"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj_id").alias("obj_id"),
            "doc_id",
            "span_offset",
        )
        .withColumn("partition_id", F.spark_partition_id())
    )


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned sink: parquet partitionBy(pred) (Iceberg-shaped layout)."""
    (
        triples.write.mode(mode)
        .partitionBy("pred")
        .parquet(path)
    )
