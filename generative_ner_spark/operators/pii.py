"""PII detection / redaction over a document corpus — the curation staple
that runs before any corpus leaves the trust boundary.

Pure JVM-side column expressions (regexp_extract_all / regexp_replace
inside whole-stage codegen — no Python, no shuffle: a single narrow
projection per document, which is the only acceptable shape for a pass
that must touch every byte of a 100 TB corpus).

Pattern design notes:
* Patterns are restricted to the regex subset with IDENTICAL semantics in
  Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
  repetition, ``\\b``, ``\\d`` — so every count and replacement is
  replayable by the q37 driver oracle.
* The phone pattern requires a leading ``+`` (international form). An
  unanchored "any 10 digits" matches order ids and timestamps; a
  production deployment would add per-locale patterns behind the same
  operator surface.
* Redaction order is email -> ip -> phone. An email never contains
  whitespace and requires an alphabetic TLD, so the later passes cannot
  corrupt earlier placeholders (placeholders contain no digits).
* Counts are RAW per-pattern occurrences while redaction is sequential:
  an IP or phone-shaped run INSIDE an email address counts toward
  n_ips/n_phones but is consumed by the earlier <EMAIL> replacement, so
  per-type counts can exceed the placeholders in the redacted text.
  Consumers needing placeholder-exact counts should count on the
  redacted column; the raw counts are the right signal for routing/
  thresholding (they measure PII density, not replacement layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_PAT = r"\+\d[\d -]{7,}\d"

PII_PATTERNS = {
    "email": (EMAIL_PAT, "<EMAIL>"),
    "ip": (IPV4_PAT, "<IP>"),
    "phone": (PHONE_PAT, "<PHONE>"),
}


def _count(col: str, pat: str) -> Column:
    # pattern as a literal Column: '\b' inside an F.expr SQL string would
    # be eaten by the SQL lexer (CLAUDE.md gotcha)
    return F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))


def with_pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts: n_emails, n_ips, n_phones, has_pii.

    One narrow projection — composes with curate()'s threshold filters
    (drop or route documents by PII density before anything shuffles).
    """
    n_emails = _count(text_col, EMAIL_PAT)
    n_ips = _count(text_col, IPV4_PAT)
    n_phones = _count(text_col, PHONE_PAT)
    return df.select(
        "*",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).alias("has_pii"),
    )


def redact_pii(df: DataFrame, text_col: str = "text",
               out: str = "redacted") -> DataFrame:
    """Replace every PII span with a typed placeholder (<EMAIL>/<IP>/
    <PHONE>). Chained regexp_replace in one projection; see module
    docstring for why the order is safe."""
    c = F.col(text_col)
    for _name, (pat, placeholder) in PII_PATTERNS.items():
        c = F.regexp_replace(c, F.lit(pat), F.lit(placeholder))
    return df.withColumn(out, c)
