"""J6 general form: large-vocabulary containment as relational plans.

The reference's containment theta-join scans every species name against
every assessment document (code/MEL/DoEE_Species.py:279-393, per-name
check at 287-303) — O(|vocab| * |text|) per document. Two scale paths
replace it:

- single-token surfaces: tokenized inverted-index equi-join
  (containment_counts below) — per-doc cost independent of |vocab|;
  the vocab side broadcasts when small, shuffles on the token
  otherwise. Pure JVM, whole-stage codegen, oracle-gated (q36).
- multi-token / substring surfaces: one Aho-Corasick pass per document
  (mentions.ac_gazetteer_detector) — O(|text| + matches), parity-pinned
  against the naive detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_PATTERN = "[a-z0-9]+"


def tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) rows — lowercased word tokens, one row per occurrence."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_PATTERN}', 0)")
        ).alias("word"),
    )


def top_k_vocab(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Data-derived vocabulary: the k most frequent tokens (ties broken
    by word for engine-independent determinism)."""
    return (
        tokenize(docs, id_col, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("_freq"))
        .orderBy(F.desc("_freq"), F.asc("word"))
        .limit(k)
        .select("word")
    )


def containment_counts(
    docs: DataFrame, vocab: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Occurrence counts per (doc, vocab word) via an equi-join on the
    token — never a per-pattern scan. The join runs BEFORE the count
    aggregation so non-vocab tokens are dropped map-side (broadcast
    vocab) and only matching rows shuffle."""
    toks = tokenize(docs, id_col, text_col)
    return (
        toks.join(F.broadcast(vocab), "word")
        .groupBy("id", "word")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("id").alias(id_col), "word", "cnt")
    )
