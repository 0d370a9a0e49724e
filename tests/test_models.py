"""Real-vectorized-model slot-in: the batch-inference detector must
produce the same mentions as its per-doc rule twin through the SAME
mapInPandas stage, proving heavy models (spaCy/flair/BERT) drop in
behind the Detector interface with no plan change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mel_tnnt_spark.plans.analyze import plan_flags


def _rows(df):
    return {
        (r["doc_id"], r["category"], r["entity"], r["start_index"],
         r["end_index"], r["sentence"])
        for r in df.collect()
    }


def test_vectorized_model_matches_rule_twin(spark, code_files):
    from mel_tnnt_spark.operators import mentions, metadata
    from mel_tnnt_spark.operators.lineage import enforce_sha_invariant

    valid, _ = enforce_sha_invariant(code_files)
    meta = metadata.mel_stage(valid)
    # materialize to a plain frame so the plan under test is the mention
    # stage alone, not the whole MEL lineage
    docs = spark.createDataFrame(
        meta.select("doc_id", "preproc_text").collect(),
        "doc_id string, preproc_text string",
    )
    vec = mentions.detect_mentions(docs, models=("vectorized_token_model",))
    rule = mentions.detect_mentions(docs, models=("token_rule_model",))
    assert _rows(vec) == _rows(rule) and vec.count() > 0
    # same single MapInPandas stage as the rule twin — no extra Arrow
    # crossings for the batch-inference model ("formatted" lists each
    # operator twice: tree + details)
    assert plan_flags(vec)["python_stages"] == plan_flags(rule)["python_stages"] == 2
    assert plan_flags(vec)["row_udfs"] == 0


def test_vectorized_model_batch_equals_per_doc():
    from mel_tnnt_spark.operators.mentions import VectorizedTokenModel

    m = VectorizedTokenModel()
    texts = [
        "Grace Hopper wrote Code in Canberra",
        "",
        "lowercase only here",
        "Ada Lovelace and Alan Turing MET",
    ]
    assert m.detect_batch(texts) == [m(t) for t in texts]


def test_spacy_detector_integration(spark):
    """End-to-end with an actual heavyweight NLP library — skipped where
    spaCy (or its model) is absent, as in this sandbox."""
    spacy = pytest.importorskip("spacy")
    try:
        spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("spaCy model en_core_web_sm not installed")
    from mel_tnnt_spark.operators import mentions

    mentions._DETECTOR_CACHE.clear()
    mentions._detectors()["spacy_model"] = mentions.spacy_detector()
    df = spark.createDataFrame(
        [("d1", "Grace Hopper worked in New York for IBM.")],
        "doc_id string, preproc_text string",
    )
    out = mentions.detect_mentions(df, models=("spacy_model",))
    assert plan_flags(out)["python_stages"] == 2  # one MapInPandas stage
    assert out.count() > 0
    mentions._DETECTOR_CACHE.pop("spacy_model", None)


def test_nltk_rescan_preserves_reference_quirks():
    """Pure-python contract of the NLTK-branch stand-in (reference
    NLTKNer.get_nltk_entities, EntityRecognition.py:671-693):
    per-category restart, within-category advance, and the found==-1
    item kept with the offset still advancing — all byte-faithful."""
    from mel_tnnt_spark.operators.mentions import nltk_category_rescan_spans

    text = "Same x Same y Same"
    # chunk order is text order; categories context-dependent
    chunks = [("Same", "A"), ("Same", "B"), ("Same", "A")]
    spans = nltk_category_rescan_spans(text, chunks, ("A", "B"))
    assert spans == [
        ("A", "Same", 0, 4),     # A scan starts at 0
        ("A", "Same", 7, 11),    # advances within A: 2nd occurrence
        ("B", "Same", 0, 4),     # B RESTARTS at 0 -> first occurrence,
    ]                            # though its chunk is really the 2nd
    # single-pass running offset would have put B's chunk at 7 — the
    # quirk is observable, not cosmetic
    # find-miss: item kept with start=-1, end=len-1, offset advances
    spans = nltk_category_rescan_spans("alpha beta", [("missing", "A")], ("A",))
    assert spans == [("A", "missing", -1, 6)]
    # categories not in the list are dropped (the label filter)
    assert nltk_category_rescan_spans("x", [("x", "Z")], ("A",)) == []


def test_csv_ner_merge_find_miss_order(spark):
    """merge_ord follows the detector's EMISSION order, not offset
    order: a find-miss mention (start=-1) emitted mid-list keeps its
    merged-list position instead of sorting first (r4 advice — the
    reference concatenates per-cell lists verbatim,
    code/NLP_NER/EntityRecognition.py:936-992)."""
    from mel_tnnt_spark.operators.mentions import csv_ner_merge

    def find_miss_detector(text):
        # Reference-shaped running-find scan over a FIXED surface list
        # (what a real NLTK chunker produces after normalization):
        # 'Ghost' is absent from the text, so its item keeps start=-1
        # at position 2 in the emitted list, offset still advancing.
        # Nested def: cloudpickle serializes it by VALUE into the task
        # closure (the inline-detector slot-in path).
        from mel_tnnt_spark.operators.mentions import nltk_category_rescan_spans

        return nltk_category_rescan_spans(
            text,
            [("Alpha", "A"), ("Beta", "A"), ("Ghost", "A"), ("Omega", "A")],
            ("A",),
        )

    cells = spark.createDataFrame(
        [("d1", 0, "Alpha then Beta then Omega")],
        "doc_id string, cell_index int, cell_text string",
    )
    out = csv_ner_merge(cells, models=(("find_miss_model", find_miss_detector),))
    rows = sorted(out.collect(), key=lambda r: r["merge_ord"])
    assert [(r["entity"], r["start_index"]) for r in rows] == [
        ("Alpha", 0),
        ("Beta", 11),
        ("Ghost", -1),   # offset-sorted this would come FIRST
        ("Omega", 21),
    ]
    assert [r["merge_ord"] for r in rows] == [1, 2, 3, 4]
    assert {r["category_count"] for r in rows} == {4}


def test_csv_ner_merge_order_stability(spark):
    """The merge order is a function of cell_index, never of physical
    row order: shuffling/reversing the cells DataFrame yields the
    identical merged output (VERDICT r3 #4's property test)."""
    from pyspark.sql import functions as F

    from mel_tnnt_spark.operators.mentions import csv_ner_merge

    rows = [
        ("d1", 0, "Alpha starts here"),
        ("d1", 1, "then Beta appears"),
        ("d1", 2, "Gamma ends Alpha"),
        ("d2", 0, "Delta only"),
    ]
    base = spark.createDataFrame(rows, "doc_id string, cell_index int, cell_text string")
    shuffled = (
        spark.createDataFrame(list(reversed(rows)), base.schema)
        .repartition(7, "cell_text")
    )
    key = ["doc_id", "cell_index", "model", "category", "entity",
           "start_index", "end_index", "merge_ord", "category_count"]
    a = sorted(tuple(r[k] for k in key) for r in csv_ner_merge(base).collect())
    b = sorted(tuple(r[k] for k in key) for r in csv_ner_merge(shuffled).collect())
    assert a == b and len(a) > 0
    # cell-order contract on d1's CAPSEQ list: Alpha(c0) -> Beta(c1) ->
    # Gamma(c2) -> Alpha(c2), counts = 4
    d1 = [t for t in a if t[0] == "d1"]
    by_ord = sorted(d1, key=lambda t: t[7])
    assert [t[4] for t in by_ord] == ["Alpha", "Beta", "Gamma", "Alpha"]
    assert {t[8] for t in d1} == {4}
