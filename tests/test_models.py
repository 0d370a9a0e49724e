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
