"""The engine's public column-function surface — one namespace, in the
style of `pyspark.sql.functions`, for every reusable Column-level function
the operators are built from.

    from postgres_etl_pipeline_spark import functions as PF
    df.select(PF.safe_div(F.col("a"), F.col("b")))

Each function returns a `pyspark.sql.Column` (JVM-side, codegen-friendly —
no Python UDFs; see SURVEY §2.9). Implementations live next to the
operators that motivated them; this module is the stable import surface a
user of the reference pipeline would reach for:

scalar / relational (reference: dbt marts + validate/enrich callables)
  money            integer-cents → DECIMAL dollars (init.sql money-in-cents)
  safe_div         NULL-on-zero division (mart_daily_sales.sql guarded div)
  day_bucket       date_trunc('day') → DATE (mart_daily_sales.sql:8)
  derived_revenue  quantity × unit_price_cents (stg_transactions.sql:44)
  dsum, dsum_expr  order-insensitive DECIMAL-cast sums

text (extensions: language-ID, quality, tokenization over `documents`)
  normalize_ws, tokens, token_count, fingerprint, stopword_hits
  redact_numbers   PII-style numeric-literal scrub (regexp, codegen)

dedup (shingle/minhash/simhash building blocks)
  shingles

vectors (similarity search over `embeddings.embedding`)
  as_double_vec, dot, norm, cosine
"""

from __future__ import annotations

from ..operators.dedup import shingles
from ..operators.relational import (
    day_bucket,
    derived_revenue,
    dsum,
    dsum_expr,
    money,
    safe_div,
)
from ..operators.similarity import as_double_vec, cosine, dot, norm
from ..operators.text import (
    fingerprint,
    normalize_ws,
    redact_numbers,
    stopword_hits,
    token_count,
    tokens,
)

__all__ = [
    "as_double_vec",
    "cosine",
    "day_bucket",
    "derived_revenue",
    "dot",
    "dsum",
    "dsum_expr",
    "fingerprint",
    "money",
    "norm",
    "normalize_ws",
    "redact_numbers",
    "safe_div",
    "shingles",
    "stopword_hits",
    "token_count",
    "tokens",
]
