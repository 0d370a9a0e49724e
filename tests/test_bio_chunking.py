"""W5/W6/M10 — BIO chunking + token-rule detector tests (reference
get_continuous_chunks semantics, code/NLP_NER/EntityRecognition.py:174-188)."""

from __future__ import annotations

from mel_tnnt_spark.operators.mentions import bio_chunks, detect_mentions_py


def test_bio_chunks_run_length_grouping():
    tagged = [
        ("Grace", "B-PER"), ("Hopper", "I-PER"), ("wrote", "O"),
        ("COBOL", "B-MISC"), ("in", "O"), ("New", "B-LOC"), ("York", "I-LOC"),
    ]
    assert bio_chunks(tagged) == [("Grace Hopper", "PER"), ("COBOL", "MISC"), ("New York", "LOC")]


def test_bio_chunks_edge_cases():
    assert bio_chunks([]) == []
    assert bio_chunks([("x", "O"), ("y", "O")]) == []
    # adjacent runs with different categories still merge per the
    # reference (grouping is on tag != 'O', category = first token's)
    assert bio_chunks([("a", "B-PER"), ("b", "B-LOC")]) == [("a b", "PER")]
    assert bio_chunks([("solo", "MISC")]) == [("solo", "MISC")]  # no prefix


def test_token_rule_detector_offsets():
    text = "Author Grace Hopper wrote code in Sydney today"
    out = detect_mentions_py("d1", text, ("token_rule_model",))
    spans = [(m["entity"], m["start_index"], m["end_index"], m["category"]) for m in out]
    assert ("Author Grace Hopper", 0, 19, "CAPSEQ") in spans
    assert ("Sydney", 34, 40, "CAPSEQ") in spans
    for m in out:
        assert text[m["start_index"] : m["end_index"]] == m["entity"]


def test_token_rule_repeated_surfaces_running_offset():
    text = "Sydney then Sydney again"
    out = detect_mentions_py("d", text, ("token_rule_model",))
    starts = sorted(m["start_index"] for m in out)
    assert starts == [0, 12]  # duplicates get successive positions (W6)
