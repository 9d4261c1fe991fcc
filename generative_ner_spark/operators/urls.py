"""URL / domain operators — the C4-style curation pass that decides which
web documents enter a training corpus by where they came from.

All pure JVM-side column expressions (regexp_extract_all inside codegen),
restricted to the Java-regex/RE2 common subset so the q40 DuckDB oracle
replays extraction byte-for-byte. The per-domain aggregation keys on the
domain string — web corpora have heavy-hitter domains, so the stats agg is
a plain map-side-combined groupBy (partial aggregation absorbs the skew;
no per-row state crosses the wire beyond (domain, partial counts)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

URL_PAT = r"https?://[^\s]+"
# capture group 1 = host (stop at first '/', ':', '?', '#' or whitespace)
DOMAIN_PAT = r"https?://([^/\s:?#]+)"


def extract_urls(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One row per URL occurrence: (id_col, url, domain). Narrow explode —
    no shuffle."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(URL_PAT), F.lit(0))
            ).alias("url"),
        )
        .withColumn(
            "domain",
            F.lower(F.regexp_extract(F.col("url"), DOMAIN_PAT, 1)),
        )
    )


def domain_stats(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-domain corpus stats: (domain, n_urls, n_docs). The blocklist /
    allowlist decision table a curation pipeline joins against."""
    urls = extract_urls(df, id_col, text_col)
    return urls.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def filter_blocklisted_domains(
    df: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """df minus documents containing a URL on a blocklisted domain.

    The blocklist is driver-sized (curation blocklists are 10^4-10^6
    domains — megabytes): broadcast join against the extracted URL rows,
    then one left_anti on doc ids. The corpus shuffles nothing; only the
    (tiny) offending doc-id set crosses the wire."""
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d.lower(),) for d in blocklist], "domain string")
    bad = (
        extract_urls(df, id_col, text_col)
        .join(F.broadcast(bl), "domain")
        .select(id_col)
        .dropDuplicates([id_col])
    )
    return df.join(bad, id_col, "left_anti")
