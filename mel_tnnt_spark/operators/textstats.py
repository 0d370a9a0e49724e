"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's Text.analysis surface
(code/MEL/__init__.py:971-982) with the curation metrics a 100 TB
pretraining pipeline needs. All JVM-side expressions (codegen-friendly,
oracle-checkable); semantics are pinned so DuckDB SQL reproduces them
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words: tiny deterministic profile per language.
# A real deployment swaps in a fastText-style model behind the same
# column contract; the heuristic keeps tests/oracles exact.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}


def _marker_score(text_col: str, words: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences as whole tokens."""
    s = None
    for w in words:
        c = F.size(F.expr(f"regexp_extract_all(lower({text_col}), '\\\\b{w}\\\\b', 0)"))
        s = c if s is None else s + c
    return s


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Predict language = argmax marker score; 'und' when all zero.
    Deterministic tie-break by language code order."""
    scored = df.select(
        F.col(id_col),
        *[_marker_score(text_col, ws).alias(f"s_{lang}") for lang, ws in LANG_MARKERS.items()],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{language}") for language in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality signals: n_chars, n_tokens, mean token length, alpha
    ratio, punct ratio, stopword-ish ratio — rounded to 4dp so floating
    point agrees across engines."""
    toks = F.expr(f"regexp_extract_all({text_col}, '[^ ]+', 0)")
    n_alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", ""))
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    stop_hits = _marker_score(text_col, LANG_MARKERS["en"])
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_calc"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_tok_len"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
    )


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (word-piece proxy: alnum runs + punctuation marks each count)."""
    ws = F.size(F.expr(f"regexp_extract_all({text_col}, '[^ ]+', 0)"))
    bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '[A-Za-z0-9]+|[^A-Za-z0-9 ]', 0)"))
    return df.select(
        F.col(id_col), ws.cast("long").alias("ws_tokens"), bpe.cast("long").alias("bpe_tokens")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowered
    text (stable across engines). For PARTIAL-overlap / contamination
    detection use dedup.winnowing_fingerprints / overlap_pairs."""
    norm = F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of each document to a bag of query terms
    (Robertson/Sparck Jones probabilistic idf, the '+1' form that keeps
    idf positive) — the retrieval-grade scorer a curation pipeline uses
    to mine topical subsets from a web-scale corpus.

    Fully relational, ONE pass over the token stream: a single
    map-side-combined aggregate groups by (doc, term-if-in-vocabulary)
    — non-query terms collapse into one null-term row per doc map-side
    — so term frequencies AND document lengths both derive from its
    <= |vocab|+1 rows per doc; corpus stats (N, avgdl) and per-term
    document frequencies are tiny aggregates folded into the broadcast
    term dim. No UDFs; every formula term is codegen arithmetic. Docs
    matching no query term score 0 and are omitted."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
        ).alias("t"),
    )
    # ONE aggregate over the token stream: vocabulary terms keep their
    # identity, everything else collapses into a per-doc null-term row
    # map-side — dl (all tokens) and tf (query terms) both read off the
    # collapsed <= |vocab|+1 rows per doc, so the expensive
    # scan+split+explode runs once, not twice
    counts = toks.groupBy(
        "id",
        F.when(F.col("t").isin(list(query_terms)), F.col("t")).alias("t"),
    ).agg(F.count("*").alias("c"))
    dl = counts.groupBy("id").agg(F.sum("c").alias("dl"))
    tf = counts.where(F.col("t").isNotNull()).select(
        "id", "t", F.col("c").alias("tf")
    )
    # corpus scalars (N, avgdl) fold into the |vocabulary|-row term dim
    # BEFORE touching the fact table, so the dim carries idf and avgdl
    # pre-computed and the fact side sees exactly two equi-joins (dl on
    # id, enriched dim broadcast on t) — the 1-row scalar cross-joins
    # happen only on the tiny dim, never against the token-derived rows
    n_docs = df.select(F.count("*").alias("n"))
    avgdl = dl.select(F.avg("dl").alias("avgdl"))
    idf = F.log((F.col("n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0)
    term_dim = (
        tf.groupBy("t")
        .agg(F.count("*").alias("df_t"))
        .crossJoin(n_docs)
        .crossJoin(avgdl)
        .select("t", idf.alias("idf"), "avgdl")
    )
    scored = tf.join(dl, "id").join(F.broadcast(term_dim), "t")
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    term_score = F.col("idf") * F.col("tf") * (k1 + 1.0) / denom
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .select(F.col("id").alias(id_col), "bm25")
    )
