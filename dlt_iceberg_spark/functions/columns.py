"""Cross-engine deterministic column helpers (re-exported single source of
truth; the implementations live with their operator families)."""

from __future__ import annotations

from dlt_iceberg_spark.operators.dedup import _tokens as _dedup_tokens
from dlt_iceberg_spark.operators.dedup import shingles
from dlt_iceberg_spark.operators.similarity import cosine, dot, l2_norm
from dlt_iceberg_spark.queries import rnd

tokens = _dedup_tokens

__all__ = ["rnd", "dot", "cosine", "l2_norm", "tokens", "shingles"]
