"""Cost estimation + budget abort (S29/S30).

Reference: src/gpt/cost.py — per-model $/1k-token tables, tiktoken counting,
Batch-API halving, running-total budget abort (CostError at
total >= limit, cost.py:219-221). Re-expressed as:

* token counting as a COLUMN: tiktoken if importable (worker-side, exact),
  else the public ~4-chars/token heuristic — one narrow projection;
* cost as arithmetic columns from a driver-side price table (model prices
  are the PUBLIC OpenAI list prices the reference also hardcodes);
* budget enforcement at stage boundaries: Spark cannot cheaply abort
  mid-stage, so the check runs between micro-batches/stages on the
  aggregated total (cost.py:197-223 semantics, same default limit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# public list prices (USD per 1k tokens), as in reference src/gpt/cost.py
MODEL_COSTS = {
    "gpt-4o-mini-2024-07-18": {"prompt": 0.00015, "completion": 0.0006},
    "gpt-4o-2024-08-06": {"prompt": 0.0025, "completion": 0.01},
    "gpt-4.1-mini": {"prompt": 0.0004, "completion": 0.0016},
}
BATCH_API_DISCOUNT = 0.5  # cost.py:165-168


class CostError(RuntimeError):
    """Budget exceeded (parity with src/gpt/cost.py CostError)."""


def _try_tiktoken():
    try:
        import tiktoken  # noqa: F401

        return tiktoken
    except ImportError:
        return None


def token_count_col(text_col: str) -> Column:
    """Estimated token count column.

    tiktoken is not importable JVM-side; when it IS available a pandas UDF
    path would be exact — in this container it is absent, so the documented
    ~4-chars-per-token heuristic applies (ceil(len/4), floor 1 for non-empty).
    """
    c = F.length(F.col(text_col))
    return F.when(c == 0, F.lit(0)).otherwise(
        F.greatest(F.ceil(c / 4.0).cast("long"), F.lit(1))
    )


def with_cost_estimate(
    df: DataFrame,
    prompt_col: str,
    completion_col: str | None = None,
    model: str = "gpt-4o-mini-2024-07-18",
    batch_api: bool = False,
) -> DataFrame:
    """Add prompt/completion token counts + usd_cost columns."""
    prices = MODEL_COSTS[model]
    disc = BATCH_API_DISCOUNT if batch_api else 1.0
    out = df.withColumn("prompt_tokens", token_count_col(prompt_col))
    if completion_col is not None:
        out = out.withColumn("completion_tokens", token_count_col(completion_col))
    else:
        out = out.withColumn("completion_tokens", F.lit(0).cast("long"))
    usd = (
        F.col("prompt_tokens") / 1000.0 * F.lit(prices["prompt"] * disc)
        + F.col("completion_tokens") / 1000.0 * F.lit(prices["completion"] * disc)
    )
    return out.withColumn("usd_cost", F.round(usd, 8))


def total_cost(df_with_cost: DataFrame) -> float:
    row = df_with_cost.agg(F.sum("usd_cost").alias("usd")).collect()[0]
    return float(row["usd"] or 0.0)


class CostBudget:
    """Running-total budget with abort (cost.py:197-223 semantics).

    ``charge`` is called at stage boundaries with that stage's aggregated
    USD; raises CostError once the running total reaches the limit
    (estimate-only mode skips the abort, like the reference's
    mode='estimate')."""

    def __init__(self, limit_usd: float = 1.0, estimate_only: bool = False):
        self.limit = limit_usd
        self.estimate_only = estimate_only
        self.total = 0.0

    def charge(self, usd: float) -> float:
        self.total += usd
        if not self.estimate_only and self.total >= self.limit:
            raise CostError(
                f"cost budget exceeded: ${self.total:.4f} >= ${self.limit:.4f}"
            )
        return self.total
