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

_PAIRS_EXPR = """
flatten(
  transform(ids, (x, i) ->
    transform(slice(ids, i + 2, size(ids) - i - 1), y -> struct(x AS a, y AS b))
  )
)
"""


def materialize_triples(linked_mentions: DataFrame) -> DataFrame:
    """linked mentions (with canonical_id, entity_type) -> triple DataFrame."""
    typing = (
        linked_mentions.select(
            F.col("canonical_id").alias("subj_id"),
            F.lit("instance_of").alias("pred"),
            F.col("entity_type").alias("obj_id"),
            "doc_id",
            "span_offset",
        )
        .dropDuplicates(["subj_id", "obj_id", "doc_id", "span_offset"])
    )

    cooc = (
        linked_mentions.groupBy("doc_id", "span_offset")
        .agg(F.sort_array(F.collect_set("canonical_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select("doc_id", "span_offset", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select(
            F.col("p.a").alias("subj_id"),
            F.lit("co_occurs_with").alias("pred"),
            F.col("p.b").alias("obj_id"),
            "doc_id",
            "span_offset",
        )
    )

    return typing.unionByName(cooc).withColumn(
        "partition_id", F.spark_partition_id()
    )


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned sink: parquet partitionBy(pred) (Iceberg-shaped layout)."""
    (
        triples.write.mode(mode)
        .partitionBy("pred")
        .parquet(path)
    )
