"""Temporal joins over event streams — the as-of join ("attach the most
recent right-side row at-or-before each left row, per key") that powers
point-in-time feature lookup, last-touch attribution, and replay joins.
Spark has no native ASOF JOIN; the naive encodings are a range join
(O(n x m) nested loop) or a per-key collect — both scale-killers.

Distributed shape, sized for 100 TB: the single-shuffle union trick.
Tag both sides, union by name, and run ONE window over (key, ts, side):
``last(right_payload, ignorenulls=True)`` with a rows-unbounded-preceding
frame hands every left row the latest right struct at-or-before it. One
Exchange on the join key for both inputs combined, no range explosion,
no driver state; skew follows the key distribution exactly like any
keyed window (same argument as sessionization).

Determinism contract: right rows sort by (ts, seq) inside the window —
pass ``right_seq_col`` when one key can carry duplicate right timestamps,
otherwise the winner among equal-ts rows would be partition-order
dependent. DuckDB's native ASOF JOIN replays the semantics as the q46
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_r",
    right_seq_col: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the right row with the
    greatest ``right_ts`` <= its ``left_ts`` within the same ``key_cols``
    group (inclusive at equality), or nulls when none exists (left join).

    Output: all left columns + ``{right_ts}{suffix}`` + each payload
    column as ``{col}{suffix}``. ``right_payload`` defaults to every
    right column except keys and timestamp. ``tolerance_seconds`` nulls
    a match that is older than the window (pandas merge_asof semantics).
    """
    keys = list(key_cols)
    payload = (list(right_payload) if right_payload is not None
               else [c for c in right.columns
                     if c not in keys and c != right_ts])
    seq = (F.col(right_seq_col).cast("long") if right_seq_col
           else F.lit(0).cast("long"))
    # a NULL right timestamp can never be "at or before" anything — but
    # NULLS sort FIRST in the ascending window, so an unfiltered NULL-ts
    # right row would sit at the frame start and its payload would match
    # EVERY left row in the key group (DuckDB's native ASOF, the q46
    # oracle, never matches NULL ts either)
    right = right.where(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        seq.alias("_seq"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(c) for c in payload],
        ).alias("_rpay"),
    )
    lf = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
    )
    # unionByName(allowMissingColumns): left rows get a typed null _rpay,
    # right rows get nulls for the left-only columns
    u = lf.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(),
                 F.col("_seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_rpay", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_ats").cast("double")
                - F.col("_m._rts").cast("double") <= tolerance_seconds,
                F.col("_m"),
            ),
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload]
    return matched.select(*out_cols)
