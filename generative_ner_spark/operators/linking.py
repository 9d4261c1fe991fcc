"""Entity-link candidate generation + top-1 scoring.

North-rule stage: broadcast alias dictionary + scored resolution. The
reference has no linking (its output stops at typed spans); semantics here
follow the standard alias-dictionary approach (candidate generation by
normalized-surface exact match, disambiguation by prior).

Scale design (100 TB of mentions, dictionary ~10^6-10^8 rows):

* The disambiguation rule (max prior, tie-break min entity_id) is
  CONTEXT-FREE, so we resolve it **on the dictionary side before the join**
  (tiny window over the dict) instead of a window over the mention stream.
  That turns linking into a single 1:1 broadcast hash join — ZERO shuffle of
  the big side, and hub-alias skew cannot hurt because broadcast joins don't
  partition by key. A salted repartition variant is kept for the case where
  the dictionary outgrows broadcast (``link_mentions(dict_broadcast=False)``)
  — there AQE skew-join handles hot aliases
  (spark.sql.adaptive.skewJoin.enabled, see plans/session.py).

* Unlinked mentions (no alias hit) get a deterministic surface-form entity id
  ``nil:<md5(mention_norm)>`` (NIL clustering by surface form) so downstream
  triples still materialize — standard KB-construction practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_aliases_top1(alias_df: DataFrame) -> DataFrame:
    """alias dict -> one row per alias: argmax_(prior desc, entity_id asc).

    Window over the SMALL side only; at web scale this is a cheap dimension
    job, amortized across every pipeline run.
    """
    w = Window.partitionBy("alias").orderBy(
        F.col("prior").desc(), F.col("entity_id").asc()
    )
    return (
        alias_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def link_mentions(
    mentions: DataFrame,
    alias_df: DataFrame,
    dict_broadcast: bool = True,
    n_salts: int = 8,
) -> DataFrame:
    """mentions(mention_norm, ...) -> + (entity_id, entity_type, prior, linked).

    dict_broadcast=True : broadcast hash join (default; no shuffle).
    dict_broadcast=False: shuffle join with explicit key salting — the dict
        side is exploded across ``n_salts`` salt values, the mention side
        draws a uniform salt, so a hub alias spreads over n_salts reducers.
    """
    resolved = resolve_aliases_top1(alias_df).withColumnRenamed("alias", "alias_key")
    if dict_broadcast:
        joined = mentions.join(
            F.broadcast(resolved),
            mentions["mention_norm"] == resolved["alias_key"],
            "left",
        )
    else:
        salted_dict = resolved.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        salted_mentions = mentions.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64("example_id", "start", "end"), F.lit(n_salts)
            ).cast("int"),
        )
        joined = salted_mentions.join(
            salted_dict,
            (salted_mentions["mention_norm"] == salted_dict["alias_key"])
            & (salted_mentions["_salt"] == salted_dict["_salt"]),
            "left",
        ).drop("_salt")

    return (
        joined.withColumn("linked", F.col("entity_id").isNotNull())
        .withColumn(
            "entity_id",
            F.coalesce(
                "entity_id", F.concat(F.lit("nil:"), F.md5("mention_norm"))
            ),
        )
        .withColumn("entity_type", F.coalesce("entity_type", "label"))
        .drop("alias_key", "prior")
    )
