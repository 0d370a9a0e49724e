"""Text functions (SURVEY.md §2.7 F1-F8) with reference-faithful
semantics.

Two layers:
- plain-Python versions (`py_*`) — byte-identical re-implementations of
  the reference routines; used inside vectorized pandas UDFs and as the
  independent oracle in tests.
- Spark column expressions / pandas UDFs — the engine's hot path.

The NFKD fold (F1) has no JVM builtin, so it is a vectorized pandas UDF;
everything else stays JVM-side (regexp_replace chains) so it runs inside
whole-stage codegen.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from mel_tnnt_spark.config import REGULAR_EXPRESSIONS, STOPWORDS

# ---------------------------------------------------------------------------
# Plain-Python reference-faithful versions
# ---------------------------------------------------------------------------

# \p{Cc}|\p{Cs} without the third-party `regex` module: enumerate the Cc
# range (U+0000-U+001F, U+007F-U+009F) and the surrogate block Cs
# (U+D800-U+DFFF). Equivalent to the reference's RE_BAD_CHARS
# (code/NLP_NER/EntityRecognition.py:808).
_BAD_CHARS = re.compile("[\x00-\x1f\x7f-\x9f\ud800-\udfff]")


def py_ascii_fold(text: str) -> str:
    """F1 — reference Text.__init__ (code/MEL/__init__.py:923-926):
    NFKD normalize then drop non-ASCII.

    ASCII fast path: NFKD is the identity on ASCII and the
    encode/decode round-trip drops nothing, so `str.isascii()` (a
    C-level flag check) short-circuits the whole normalize+encode for
    the dominant case in real corpora — provably byte-identical
    (hypothesis-pinned in test_text_functions)."""
    s = str(text)
    if s.isascii():
        return s
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("utf-8")


def py_clean_text(text: str) -> str:
    """F2 — reference Text.cleanText (code/MEL/__init__.py:943-953):
    unicode replacements applied on the ascii-folded text."""
    return (
        py_ascii_fold(text)
        .replace("\u2013", "-")
        .replace("\u2019", "'")
        .replace("\u00a0", " ")
        .replace("\u0007", " ")
    )


def py_preprocess_text(text: str) -> str:
    """F3 — reference NER.preprocess_text
    (code/NLP_NER/EntityRecognition.py:803-812), byte-identical."""
    text = text.replace("\n", " ").replace("\\r\\n", " ").replace("\r", " ")
    text = re.sub(r"[-()<=>~`|{}@#?!&$]+\ *", " ", text)
    text = text.replace("[", "").replace("]", "")
    text = _BAD_CHARS.sub("", text)
    return " ".join(text.split())


def py_csv_preprocess(clean_text: str) -> list[str]:
    """F4 — reference NER.csv_preprocess
    (code/NLP_NER/EntityRecognition.py:793-801)."""
    text = re.sub(r"[-()<=>~`|{}@#?!&$]+\ *", " ", clean_text)
    text = text.replace("\n", ",")
    text = _BAD_CHARS.sub("", text)
    return text.split(",")


def py_context_sentence(start_char: int, text: str) -> str | None:
    """F5 — reference NER.get_context_sentence
    (code/NLP_NER/EntityRecognition.py:825-832): split on '.', walk a
    running length (+1 per period) until the offset falls inside."""
    total_length = 0
    for sentence in text.split("."):
        total_length = len(sentence) + total_length + 1
        if start_char < total_length:
            return sentence
    return None


def split_long_text(
    text: str,
    max_len: int,
    puncts: tuple[str, ...] = (".", ";", ":", ","),
) -> list[tuple[int, str]]:
    """Recursive punctuation splitter for giant documents — the
    reference bounds model sequence length by splitting on a punctuation
    priority list and recursing when a piece is still too long
    (BERTNer.get_entity_by_punctuation, code/NLP_NER/
    EntityRecognition.py:649-661; punctuation_list
    NLP-NER-config.json). Two deliberate divergences:

    - offset-preserving: returns (start, chunk) with the separator kept
      attached to the LEFT piece, so ''.join(chunks) == text and every
      chunk start is an exact offset into the original (the reference
      relocates by re-finding entities in the full text instead);
    - loss-free: when the punctuation list is exhausted the remainder is
      hard-cut at max_len (the reference silently DROPS text longer
      than max_length with no punctuation, index==4 branch);
    - a cut happens only after punctuation FOLLOWED BY WHITESPACE, so
      in-token punctuation (URLs, emails, '$1,234.56') never splits an
      entity — the reference's bare split() would.

    Consecutive pieces are greedily packed up to max_len. Because the
    whitespace stays with the RIGHT piece, the '.'-delimited sentence
    parts inside a chunk are byte-identical to the full-text ones
    (context-sentence fidelity, tested)."""
    return _split_rec(text, max_len, puncts, 0, 0)


def _split_rec(
    text: str, max_len: int, puncts: tuple[str, ...], pi: int, base: int
) -> list[tuple[int, str]]:
    if len(text) <= max_len:
        return [(base, text)] if text else []
    if pi >= len(puncts):
        return [(base + i, text[i : i + max_len]) for i in range(0, len(text), max_len)]
    # cut right after the punct char when whitespace follows (the
    # whitespace opens the next piece)
    cuts = [m.end() for m in re.finditer(re.escape(puncts[pi]) + r"(?=\s)", text)]
    bounds = [0] + [c for c in cuts if 0 < c < len(text)] + [len(text)]
    segs: list[tuple[int, str]] = [
        (bounds[i], text[bounds[i] : bounds[i + 1]])
        for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]
    out: list[tuple[int, str]] = []
    cur_start = -1
    cur_len = 0
    for s, seg in segs:
        if len(seg) > max_len:
            if cur_start >= 0:
                out.append((base + cur_start, text[cur_start:s]))
                cur_start = -1
            out.extend(_split_rec(seg, max_len, puncts, pi + 1, base + s))
        elif cur_start < 0:
            cur_start, cur_len = s, len(seg)
        elif cur_len + len(seg) <= max_len:
            cur_len += len(seg)
        else:
            out.append((base + cur_start, text[cur_start:s]))
            cur_start, cur_len = s, len(seg)
    if cur_start >= 0:
        out.append((base + cur_start, text[cur_start:]))
    return out


_WORD_TOKEN = re.compile(r"[A-Za-z0-9_']+")
_STOPSET = frozenset(STOPWORDS)


def py_extract_keywords(ascii_text: str) -> dict[str, int]:
    """A2 — reference Text.extractKeywords (code/MEL/__init__.py:931-941).

    Divergence (documented): the reference tokenizes with
    nltk.word_tokenize + nltk stopwords; this engine pins a regex
    tokenizer ([A-Za-z0-9_']+) and the frozen STOPWORDS list so Spark,
    DuckDB oracles, and tests agree exactly. Counting semantics (case
    kept, occurrence counts) match the reference.
    """
    counts: dict[str, int] = {}
    for word in _WORD_TOKEN.findall(ascii_text):
        if word.lower() not in _STOPSET:
            counts[word] = counts.get(word, 0) + 1
    return counts


def py_pattern_matching(clean_text: str) -> dict[str, dict[str, int]]:
    """A3 — reference Text.applyPatternMatching
    (code/MEL/__init__.py:955-969): findall per named pattern with
    re.ASCII|re.MULTILINE; tuple matches joined; occurrence counts."""
    out: dict[str, dict[str, int]] = {}
    for name, pattern in REGULAR_EXPRESSIONS.items():
        prog = re.compile(pattern, flags=re.ASCII | re.MULTILINE)
        matches: dict[str, int] = {}
        for item in prog.findall(clean_text):
            key = "".join(item) if not isinstance(item, str) else item
            matches[key] = matches.get(key, 0) + 1
        out[name] = matches
    return out


# ---------------------------------------------------------------------------
# Spark-side versions
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def ascii_fold_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """F1 as a scalar-iterator pandas UDF (Arrow-batched; the only
    Python hop in the MEL stage)."""
    for s in batches:
        yield s.map(lambda t: py_ascii_fold(t) if t is not None else None)


def clean_preprocess_series(s: pd.Series) -> pd.Series:
    """F1+F2+F3 fused over a pandas Series — byte-identical to
    py_preprocess_text(py_clean_text(x)) per element (equivalence-
    tested). This is the in-batch half of the fused mention stage
    (detect_mentions(preprocess=True)); the other half is not paying
    two extra Arrow crossings of the content bytes.

    Deliberately a per-element map, NOT a pandas .str chain: the chain
    builds ~14 full intermediate copies of the batch's strings and is
    memory-bandwidth-bound — measured on the 400k-doc scaling run it
    was even with the map at 2 cores but 1.8x SLOWER at 8 (33.3 s vs
    18.5 s end-to-end), exactly the bandwidth saturation a wide
    cluster stage must avoid. The per-row composition touches each
    string a constant number of times with cache-resident
    intermediates."""
    return s.map(
        lambda t: py_preprocess_text(py_clean_text(t)) if t is not None else ""
    )


@F.pandas_udf(StringType())
def clean_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """F2 as a pandas UDF (NFKD fold + the reference replacement chain)."""
    for s in batches:
        yield s.map(lambda t: py_clean_text(t) if t is not None else None)


def preprocess_text_col(col: Column) -> Column:
    """F3 JVM-side: the same transformation chain as py_preprocess_text
    expressed with regexp_replace so it stays in whole-stage codegen.

    Java regex supports \\p{Cc}/\\p{Cs} directly. The trailing
    trim(regexp_replace(.,'\\s+',' ')) is equivalent to Python's
    ' '.join(text.split()) on ASCII input.
    """
    c = F.regexp_replace(col, r"\n|\r|\\r\\n", " ")
    c = F.regexp_replace(c, r"[\-()<=>~`|{}@#?!&$]+ *", " ")
    c = F.regexp_replace(c, r"[\[\]]", "")
    c = F.regexp_replace(c, r"[\p{Cc}\p{Cs}]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def keyword_counts(df, id_col: str, text_col: str):
    """A2 relationally: explode regex tokens -> stopword anti-filter ->
    groupBy count. Map-side partial aggregation comes free from
    groupBy().count(); no Python in the loop.

    Returns (id, word, cnt) rows — the exploded form of the reference's
    Tokenized-text$Keywords counting map.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.expr(f"regexp_extract_all({text_col}, '[A-Za-z0-9_\\']+', 0)")).alias("word"),
    )
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return (
        toks.where(~F.array_contains(stop, F.lower(F.col("word"))))
        .groupBy(id_col, "word")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def pattern_match_counts(df, id_col: str, text_col: str, patterns: dict[str, str] | None = None):
    """A3 relationally: per named pattern, regexp_extract_all -> explode ->
    groupBy(id, pattern, match).count(). One union branch per pattern;
    Catalyst shares the scan.

    NOTE: Java regex (JVM) differs from Python `re` on a few reference
    patterns (lookahead in URLs is fine in Java; re.ASCII has no Java
    equivalent — \\w is already ASCII in Java by default). Parity for the
    reference patterns is tested in tests/test_text_functions.py.
    """
    pats = patterns or REGULAR_EXPRESSIONS
    parts = []
    for name, pat in pats.items():
        esc = pat.replace("\\", "\\\\").replace("'", "\\'")
        parts.append(
            df.select(
                F.col(id_col),
                F.lit(name).alias("pattern"),
                F.explode(F.expr(f"regexp_extract_all({text_col}, '{esc}', 0)")).alias("match"),
            )
        )
    allm = parts[0]
    for p in parts[1:]:
        allm = allm.unionByName(p)
    return allm.groupBy(id_col, "pattern", "match").count().withColumnRenamed("count", "cnt")
