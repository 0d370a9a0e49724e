"""Unit tests for the F1-F8/A2/A3 text layer: the Spark-side
implementations must agree with the reference-faithful python versions
(which are themselves transcriptions of code/MEL/__init__.py:920-982 and
code/NLP_NER/EntityRecognition.py:793-832)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mel_tnnt_spark.functions.text import (
    clean_text_udf,
    keyword_counts,
    pattern_match_counts,
    preprocess_text_col,
    py_clean_text,
    py_context_sentence,
    py_extract_keywords,
    py_pattern_matching,
    py_preprocess_text,
)

SAMPLES = [
    "Plain ascii text. Two sentences here.",
    "Unicode: café naïve – dash ’quote’  nbsp bell",
    "Email a.b@x.co and URL https://www.example.org/page plus $1,234.56",
    "ALL-CAPS and IDs 2021-456 and phone +61 2 6125 0000 ok",
    "brackets [x] (y) {z} and\nnewlines\r\nhere\ttabs",
    "",
]


def test_clean_and_preprocess_parity(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, raw string")
    got = (
        df.withColumn("clean", clean_text_udf("raw"))
        .withColumn("prep", preprocess_text_col(F.col("clean")))
        .orderBy("id")
        .collect()
    )
    for row, raw in zip(got, SAMPLES):
        assert row["clean"] == py_clean_text(raw)
        assert row["prep"] == py_preprocess_text(py_clean_text(raw))


def test_keyword_counts_parity(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, text string")
    got = keyword_counts(df, "id", "text").collect()
    by_id: dict[int, dict[str, int]] = {}
    for r in got:
        by_id.setdefault(r["id"], {})[r["word"]] = r["cnt"]
    for i, s in enumerate(SAMPLES):
        assert by_id.get(i, {}) == py_extract_keywords(s)


def test_pattern_match_counts_parity(spark):
    # patterns portable between Java regex and python re (the full
    # reference URL pattern has (?!...) which Java also supports; the
    # tuple-joining findall semantics differ, so compare on the
    # non-group patterns here and cover group patterns via py_* only)
    pats = {
        "e-mails": r"[\w\.-]+@[\w\.-]+\.\w+",
        "phone-numbers": r"[\+\(]?[0-9][0-9 .\-\(\)]{8,}[0-9]",
    }
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, text string")
    got = pattern_match_counts(df, "id", "text", pats).collect()
    by_key = {(r["id"], r["pattern"], r["match"]): r["cnt"] for r in got}
    for i, s in enumerate(SAMPLES):
        ref = py_pattern_matching(s)
        for name in pats:
            for m, c in ref[name].items():
                assert by_key.get((i, name, m)) == c, (i, name, m)


def test_pattern_matching_reference_shapes():
    out = py_pattern_matching("Contact a.b@x.co or visit https://www.example.org now $12.50 2021-456")
    assert out["e-mails"] == {"a.b@x.co": 1}
    assert "IDs-start-with-year" in out and out["IDs-start-with-year"] == {"2021-456": 1}
    assert list(out["money-amounts-with-decimals"])  # tuple-join semantics produce a key


def test_sentence_lookup_equivalence():
    from mel_tnnt_spark.operators.mentions import SentenceLookup

    texts = [
        "First one. Second two. Third three.",
        "no periods here at all",
        "a.b.c.",
        ". leading. and .. doubles .",
        "",
    ]
    for t in texts:
        lookup = SentenceLookup(t)
        for off in range(0, len(t) + 3):
            assert lookup(off) == py_context_sentence(off, t), (t, off)


def test_context_sentence_reference_semantics():
    text = "First one. Second two. Third three."
    # offset 0 is in the first sentence
    assert py_context_sentence(0, text) == "First one"
    # offset just past the first period lands in sentence 2 (reference
    # counts +1 per period, code/NLP_NER/EntityRecognition.py:825-832)
    assert py_context_sentence(12, text) == " Second two"
    assert py_context_sentence(len(text) - 1, text) == " Third three"


def test_clean_preprocess_series_byte_identity(spark):
    """The fused pandas .str chain must equal the py twins byte-for-byte
    on adversarial inputs (unicode folds, control chars, surrogates,
    escapes, None)."""
    import random

    import pandas as pd

    from mel_tnnt_spark.functions.text import (
        clean_preprocess_series,
        py_clean_text,
        py_preprocess_text,
    )

    rng = random.Random(5)
    pool = [
        "Grace Hopper", "café – test", "ab", "[x](y)", "https://a.b/c",
        "$1,234.56", "tab\tnl\n", " sp", "line1\nline2\r\nline3",
        "ctrl\x01\x02", "", "ab<=>cd@#!", "NFKD ①ﬁ fi",
        "bel\x07bel", "back\\r\\nslash",
    ]
    texts = [" ".join(rng.choices(pool, k=rng.randint(0, 8))) for _ in range(500)]
    texts.append(None)
    got = clean_preprocess_series(pd.Series(texts, dtype=object)).tolist()
    exp = [py_preprocess_text(py_clean_text(t)) if t is not None else "" for t in texts]
    assert got == exp


def test_ascii_fold_fast_path_byte_identity():
    """The isascii() short-circuit in py_ascii_fold must be
    byte-identical to the full NFKD+encode formula on ANY input."""
    import unicodedata

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mel_tnnt_spark.functions.text import py_ascii_fold

    def spec(s):
        return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("utf-8")

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=64))
    def check(s):
        assert py_ascii_fold(s) == spec(s)

    check()
    for s in ("", "plain ascii", "café", "naïve — ﬁ ŒÆ", "\x07bel\x00", "🎉🌍", "ﬃ ½ Ⅻ"):
        assert py_ascii_fold(s) == spec(s)


def test_merge_upsert_rejects_key_mismatch(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    import pytest as _pytest

    from mel_tnnt_spark.operators.merge_sink import merge_upsert

    target = str(tmp_path / "tblk")
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    merge_upsert(spark, target, base, keys=("k",))
    with _pytest.raises(ValueError, match="bucketed by keys"):
        merge_upsert(spark, target, base, keys=("v",))


def test_nltk_rescan_property_matches_reference_loop():
    """Property: nltk_category_rescan_spans is byte-equivalent to a
    literal transcription of the reference loop
    (NLTKNer.get_nltk_entities, code/NLP_NER/EntityRecognition.py:
    671-693) over random texts and chunk lists — including find
    misses (-1 starts) and duplicate surfaces across categories."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mel_tnnt_spark.operators.mentions import nltk_category_rescan_spans

    words = st.sampled_from(["alpha", "beta", "gamma", "Same", "Dup", "x"])
    cats = ("A", "B", "C")

    @settings(max_examples=200, deadline=None)
    @given(
        toks=st.lists(words, min_size=0, max_size=12),
        chunks=st.lists(
            st.tuples(words, st.sampled_from(cats + ("Z",))), min_size=0, max_size=8
        ),
    )
    def check(toks, chunks):
        text = " ".join(toks)

        # literal reference transcription (dict-of-lists shape)
        ref: dict[str, list] = {}
        for category in cats:
            offset = 0
            for entity_text, label in chunks:
                if label != category:
                    continue
                offset = text.find(entity_text, offset)
                item = (category, entity_text, offset, offset + len(entity_text))
                offset += len(entity_text)
                ref.setdefault(category, []).append(item)
        want = [it for c in cats for it in ref.get(c, [])]

        assert nltk_category_rescan_spans(text, chunks, cats) == want

    check()


def test_band_widths_properties():
    """Property: for every valid (k, bands), band_widths yields exactly
    `bands` widths, each >= 1, summing to k, non-increasing (front
    bands take the remainder)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mel_tnnt_spark.operators.dedup import band_widths

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 128).flatmap(lambda k: st.tuples(st.just(k), st.integers(1, k))))
    def check(kb):
        k, bands = kb
        ws = band_widths(k, bands)
        assert len(ws) == bands
        assert sum(ws) == k
        assert min(ws) >= 1
        assert all(a >= b for a, b in zip(ws, ws[1:]))

    check()


def test_winnowing_guarantee_property():
    """Property (Schleimer et al. 2003, with the full-window variant):
    any run of >= window+n-1 tokens shared by two documents yields at
    least one shared fingerprint — checked on the hashlib mirror that
    test_winnowing_full_windows_only pins byte-equal to the Spark
    operator, over random contexts and run placements."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tests.test_curation_ops import _py_winnow

    n, window = 3, 4
    vocab = ["w%d" % i for i in range(30)]
    tok = st.sampled_from(vocab)

    @settings(max_examples=150, deadline=None)
    @given(
        run=st.lists(tok, min_size=window + n - 1, max_size=14),
        pre_a=st.lists(tok, min_size=0, max_size=8),
        suf_a=st.lists(tok, min_size=0, max_size=8),
        pre_b=st.lists(tok, min_size=0, max_size=8),
        suf_b=st.lists(tok, min_size=0, max_size=8),
    )
    def check(run, pre_a, suf_a, pre_b, suf_b):
        a = " ".join(pre_a + run + suf_a)
        b = " ".join(pre_b + run + suf_b)
        assert _py_winnow(a, n, window) & _py_winnow(b, n, window), (
            f"shared {len(run)}-token run produced no shared fingerprint"
        )

    check()
