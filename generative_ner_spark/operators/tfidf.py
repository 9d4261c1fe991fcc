"""TF-IDF keyword extraction over the corpus — the classic "what is this
document about" signal a training-data pipeline uses for topic balancing,
cluster labeling, and retrieval-style near-dup triage.

Distributed shape, sized for 100 TB:

* term frequencies: one narrow explode of the tokenized text ->
  groupBy(id, term) count — map-side combined, keys are uniform (doc id x
  term), no skew concern;
* document frequencies: the SAME per-doc distinct (id, term) rows
  aggregate by term — map-side combine absorbs stopword heavy-hitters
  (the reduce side sees one partial per partition per term, exactly the
  domain_stats argument);
* the corpus size is a one-row aggregate broadcast into the score
  expression (crossJoin of a 1-row frame — Spark plans
  BroadcastNestedLoopJoin over a single row: free);
* idf join: (id, term, tf) joins term -> df on the term key. The idf
  table is vocabulary-sized — often broadcastable, and AQE upgrades the
  join when it is; the slim fact side carries three columns only;
* top-k per doc: row_number window partitioned by doc id (uniform key).

Everything is JVM-side column expressions => full DuckDB oracle (q43).
Scores are rounded to 6 decimals on BOTH sides so cross-engine float
noise cannot break value-hash equality (the established oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf): lowercased whitespace tokens counted per doc.

    Same tokenizer as decontam.word_ngrams (Java ``\\s`` == the explicit
    ``[ \\t\\n\\x0b\\f\\r]`` class the DuckDB oracles use)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"filter(split(lower({text_col}), '\\\\s+'), "
                   "x -> x != '')")
        ).alias("term"),
    )
    return toks.groupBy("id", "term").agg(F.count("*").alias("tf"))


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) from the term_frequencies output — each (id, term) row
    is already distinct per doc, so this is a plain count per term."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF:

        score = tf * (ln((n_docs + 1) / (df + 1)) + 1)

    (the sklearn-style smooth idf — never negative, never div-by-zero).
    ``min_df`` drops hapax noise before scoring. Ties break on term asc so
    the output is total-ordered and exactly reproducible cross-engine.
    Output: (id_col, term, tf, df, score, rank), rank <= top_k.
    """
    tf = term_frequencies(df, id_col, text_col)
    docfreq = document_frequencies(tf).where(F.col("df") >= min_df)
    n_docs = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(F.col("id").alias(id_col), "term", "tf", "df", "score",
                "rank")
    )
