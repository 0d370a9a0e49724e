"""Sampling operators (reference: per-extension / per-size-bucket random
sampling QA harness, code/NLP_NER/Sampling.py:25-166; rates in
sampling-config.json).

Two variants:
- `stratified_sample`: Spark-native sampleBy (probabilistic, like the
  reference's random.sample — not oracle-checkable by construction).
- `deterministic_sample`: hash-mod systematic sampling — the
  scale-appropriate form (reproducible across runs/engines, no RNG
  state), used for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_bucket(col_name: str) -> F.Column:
    """A9 — the reference's <100KB / <1MB / >=1MB buckets
    (code/NLP_NER/Sampling.py:126-136), parameterized here in bytes of
    the given length column."""
    c = F.col(col_name)
    return (
        F.when(c < 100 * 1024, "small").when(c < 1024 * 1024, "medium").otherwise("large")
    )


def stratified_sample(df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 42) -> DataFrame:
    return df.sampleBy(strata_col, fractions, seed)


def deterministic_sample(df: DataFrame, id_col: str, rate_denominator: int = 10) -> DataFrame:
    """Keep rows where md5(id) mod D == 0 — engine-portable systematic
    sample at rate 1/D."""
    h = f"CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    return df.where(F.expr(f"pmod({h}, {rate_denominator}) = 0"))
