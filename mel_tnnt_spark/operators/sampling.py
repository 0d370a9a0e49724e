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


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, the A-ES one-pass scheme): each row draws a deterministic
    pseudo-uniform u from md5(id) and is ranked by key = -ln(u)/w —
    the k smallest keys are EXACTLY a weight-proportional sample
    without replacement. The curation use: sample a fixed-size
    training subset biased toward quality/length weights,
    reproducibly (no RNG state, same sample on any engine — the
    oracle re-derives it).

    Rows with NULL or non-positive weight are never sampled (the
    standard A-ES domain; they'd need key = +inf).

    Scale: the k-smallest is a global top-k (TakeOrderedAndProject:
    per-partition heaps, one k-row merge at the driver) — no global
    sort, no single-partition window. Scaling every weight by a
    positive constant rescales every key by its inverse, so the
    SAMPLE is scale-invariant (property-pinned)."""
    if k < 0:
        raise ValueError(f"weighted_sample: k must be >= 0, got {k}")
    # u = (h+1) / 16^15 in (0, 1]: h is the first 60 bits of md5(id),
    # +1 keeps ln(u) finite at h = 0. 16^15 = 2^60 is exact in double
    # and int64 -> double rounds identically on both engines.
    h = (
        f"CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 15), 16, 10) "
        "AS DOUBLE)"
    )
    u = (F.expr(h) + F.lit(1.0)) / F.lit(float(16**15))
    key = -F.log(u) / F.col(weight_col)
    # Order/select on the FULL-precision key (boundary gaps are ~1/n,
    # far above cross-engine libm-ln ulp); emit it rounded to 6 so the
    # value hash can't trip on last-ulp ln() divergence.
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_k", key)
        .orderBy("_k", id_col)
        .limit(k)
        .withColumn("es_key", F.round(F.col("_k"), 6))
        .drop("_k")
    )
