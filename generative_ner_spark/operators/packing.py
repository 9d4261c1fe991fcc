"""Deterministic sequence packing — assign documents to fixed-token-budget
training bins ("concat-and-chunk": documents are laid out in a
deterministic stream order and the stream is cut every ``token_budget``
tokens; a document belongs to the bin where its first token lands). The
standard pretraining batch-assembly primitive, restated for Spark.

Scale design — the whole point of this operator's shape:

* A SINGLE global stream order would serialize the cumulative sum (one
  window partition = one task = the whole corpus through one executor).
  Packing is therefore SHARDED: a deterministic md5 shard key splits the
  corpus into ``shards`` independent streams, each packed by its own
  window partition — shard-parallel, and each training shard/bin is still
  exactly reproducible from (doc ids, salt) alone, on any cluster size or
  engine (md5 is md5: the q39 DuckDB oracle replays shard, order, and bin
  assignment byte-for-byte).
* The only shuffle is the window's hash-partition on the ~uniform shard
  key. Token counts are whitespace counts here; swap token_count_col for
  a real tokenizer count column upstream without touching the packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from generative_ner_spark.operators.quality import token_count_col


def _md5_key(key_col: str, salt: str):
    return F.md5(F.concat(F.lit(f"{salt}:"),
                          F.col(key_col).cast("string")))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Per doc: (id_col, n_tokens, shard, bin) — bin = which
    ``token_budget``-token training sequence of its shard's stream the
    document STARTS in. Deterministic: stream order inside a shard is the
    md5 order key, shard is an md5 mod, so the packing is identical on
    every run/engine/cluster size."""
    # shard derives from the SAME _okey column (hash once per row; and
    # the salt never rides inside a SQL string, so a quote in it can't
    # break the expression — F.lit in _md5_key handles any salt)
    toks = df.select(
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
        _md5_key(id_col, salt).alias("_okey"),
    ).withColumn(
        "shard",
        F.expr(f"pmod(cast(conv(substring(_okey, 1, 15), 16, 10) as long), "
               f"{int(shards)})"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "n_tokens",
            "shard",
            F.floor((F.col("_cum") - F.col("n_tokens")) / token_budget)
            .alias("bin"),
        )
    )


def packing_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Aggregate packing layout: (shard, bin, n_docs, n_tokens) — the
    bin-fill profile a training job consumes (and the cheap check that
    every bin except a shard's last holds ~token_budget tokens)."""
    packed = pack_sequences(df, id_col, text_col, token_budget, shards, salt)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window document chunking -> one row per chunk
    ``(id_col, chunk_id, start_token, n_tokens, chunk_text)`` — the
    RAG-indexing / context-window-splitting staple. Chunks start every
    ``chunk_tokens - overlap`` tokens (so consecutive chunks share
    ``overlap`` tokens); every token position is covered, the final
    chunk may be short, and whitespace inside a chunk is normalized to
    single spaces (tokens are rejoined with ' ').

    Scale shape: a pure narrow projection — tokenize, build the start
    offsets with an O(1)-depth ``sequence``, explode, slice. No shuffle,
    no UDF; a 100 TB corpus chunks at parquet-scan speed and the output
    stays partitioned exactly like the input. Start offsets run over
    ``sequence(0, max(n - overlap - 1, 0), step)`` — the upper bound
    stops BEFORE a start whose chunk would sit entirely inside the
    previous one (a tail <= overlap is already covered), while the last
    emitted start s satisfies s + chunk_tokens >= n, so every token is
    covered exactly by ceil(max(n - overlap, 1) / step) chunks and a
    doc shorter than ``chunk_tokens`` yields exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), "[ \t\n\x0b\f\r]+"),
        lambda x: x != F.lit(""))
    return (
        df.select(F.col(id_col), toks.alias("_tk"))
        .where(F.size("_tk") > 0)
        .select(
            id_col, "_tk",
            F.posexplode(
                F.expr(f"sequence(0, greatest(size(_tk) - {int(overlap)}"
                       f" - 1, 0), {int(step)})")
            ).alias("chunk_id", "start_token"),
        )
        .select(
            id_col,
            "chunk_id",
            "start_token",
            F.least(
                F.lit(int(chunk_tokens)),
                F.size("_tk") - F.col("start_token")).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_tk"), F.col("start_token") + 1,
                        F.lit(int(chunk_tokens))),
                " ").alias("chunk_text"),
        )
    )


def shard_layout(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the training-data
    write-layout primitive ("shuffle the corpus, cut it into N files"):
    every row gets ``shard`` (md5-uniform in [0, n_shards)) and ``pos``
    (its 0-based position within the shard, in md5-rank order with the
    id as tiebreak). The layout is a pure function of (ids, salt, n):
    identical on every run, engine, cluster size, and input order — the
    property RNG-based shuffles can't give a resumable pipeline. Write
    with ``partitionBy("shard")`` (or repartition on it) for the final
    files.

    Scale shape: one codegen hash projection + ONE Exchange on the
    shard key (~uniform by construction: no skew) for the per-shard
    position window; ``n_shards`` is the parallelism knob — size it so
    a shard fits a task comfortably (same argument as pack_sequences'
    shards). Fully SQL-expressible => full q83 oracle.
    """
    h = _md5_key(id_col, salt)
    out = df.withColumn("_h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("_h"), 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc())
    return (
        out.withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_h")
    )
