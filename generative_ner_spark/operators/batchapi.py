"""Batch-task builder/sink + keyed result join (S18-S20).

Reference flow (src/gpt/openai_api.py:293-363, 393-500;
src/cli/run_batchapi.py): accumulate tasks ``{custom_id: "task-{i}", body}``,
save JSONL chunked at 50,000 tasks/file, submit, poll, download, then re-join
results to inputs PURELY BY FILE ORDER (``pop(0)``) — correctness depends on
identical iteration order between submit and retrieve runs.

Spark restatement replaces the positional zip with a keyed equi-join on
``custom_id`` (same semantics, order-safe, resumable) — the reference's only
"join" made explicit. The HTTP submit/poll control plane stays driver-side
(it is not a data-parallel operation); here it is stubbed by a deterministic
local responder so the whole loop is testable hermetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BATCH_FILE_CHUNK = 50_000  # openai_api.py:348


def build_batch_tasks(
    examples: DataFrame,
    model: str = "gpt-4o-mini-2024-07-18",
    temperature: float = 0.2,
    top_p: float = 0.9,
    seed: int = 0,
    max_tokens: int = 4096,
    bucket_chars: int = 2,
) -> DataFrame:
    """examples (example_id, prompt) -> Batch-API task rows.

    custom_id = "task-{i}" with i a dense row number (parity with
    openai_api.py:318); the (example_id -> custom_id) mapping column makes
    the later keyed re-join explicit. Defaults mirror configs/config_gpt.yaml.

    Numbering is deterministic WITHOUT a global single-partition window
    (the r1 form, Window.orderBy with no partitionBy, funneled every row
    through one partition — a scale-killer for the 100 TB batch builder):
    rows are bucketed by an md5 prefix of example_id (uniform, pure function
    of the key — so the two passes below can never disagree), per-bucket
    counts (map-side combine, 16^bucket_chars rows) become broadcast
    offsets, and a per-bucket window assigns offset + local row_number.
    Global order = (md5_prefix, example_id) — SQL-replicable, see the q22
    oracle. Raise ``bucket_chars`` for more numbering parallelism at scale.
    """
    b = F.substring(F.md5(F.col("example_id").cast("binary")), 1, bucket_chars)
    # localCheckpoint: the counts pass (offsets) and the numbering pass must
    # see the IDENTICAL row set — if the input were nondeterministic or its
    # source changed between the two jobs, offsets would disagree with
    # per-bucket row counts and custom_ids could collide. Lazy: the counts
    # action below materializes it; no extra job.
    bucketed = examples.withColumn("_bucket", b).localCheckpoint(eager=False)
    counts = bucketed.groupBy("_bucket").agg(F.count("*").alias("_n")).collect()
    offs, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_bucket"]):
        offs.append((r["_bucket"], acc))
        acc += r["_n"]
    odf = examples.sparkSession.createDataFrame(
        offs, "_bucket string, _offset long"
    )
    w = Window.partitionBy("_bucket").orderBy("example_id")
    return bucketed.join(F.broadcast(odf), "_bucket").withColumn(
        "custom_id",
        F.concat(
            F.lit("task-"),
            (F.col("_offset") + F.row_number().over(w) - 1).cast("string"),
        ),
    ).select(
        "custom_id",
        "example_id",
        F.struct(
            F.lit(model).alias("model"),
            F.lit(temperature).alias("temperature"),
            F.lit(max_tokens).alias("max_tokens"),
            F.lit(top_p).alias("top_p"),
            F.lit(seed).alias("seed"),
            F.lit(1).alias("n"),
            F.col("prompt").alias("messages"),
        ).alias("body"),
    )


def save_batch_files(tasks: DataFrame, path: str,
                     max_records_per_file: int = BATCH_FILE_CHUNK) -> None:
    """JSONL sink chunked at 50k tasks/file (openai_api.py:348-363)."""
    (
        tasks.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )


def stub_batch_responder(tasks: DataFrame) -> DataFrame:
    """Deterministic local stand-in for the Batch API: one response row per
    task, intentionally SHUFFLED (repartitioned) to prove the keyed join is
    order-independent — exactly the property the reference's pop(0) lacks."""
    return (
        tasks.select(
            "custom_id",
            F.concat(F.lit("echo:"), F.col("custom_id")).alias("generated_text"),
        )
        .repartition(7)  # scramble order on purpose
    )


def join_results(inputs: DataFrame, results: DataFrame) -> DataFrame:
    """Keyed equi-join on custom_id (replaces run_batchapi.py:68 pop(0))."""
    return inputs.join(results, "custom_id", "inner")
