"""Giant-document chunking: split_long_text invariants (hypothesis),
chunked == unchunked mention equality, and the chunk-parallel path."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mel_tnnt_spark.functions.text import split_long_text

ALPHABET = st.sampled_from(list("ab .;:,XY\n"))


@given(st.text(alphabet=ALPHABET, max_size=400), st.integers(min_value=1, max_value=50))
@settings(max_examples=300, deadline=None)
def test_split_long_text_invariants(text, max_len):
    chunks = split_long_text(text, max_len)
    # lossless cover, exact offsets, bounded lengths
    assert "".join(c for _, c in chunks) == text
    for start, chunk in chunks:
        assert chunk
        assert len(chunk) <= max_len
        assert text[start : start + len(chunk)] == chunk
    starts = [s for s, _ in chunks]
    assert starts == sorted(starts)


def test_split_prefers_sentence_boundaries():
    text = "alpha beta. gamma delta. epsilon zeta. eta theta."
    chunks = split_long_text(text, 30)
    # every boundary falls right after a '.', no mid-sentence cuts
    for start, _ in chunks[1:]:
        assert text[start - 1] == "."


def _mention_set(df):
    return {
        (r["doc_id"], r["model"], r["category"], r["entity"],
         r["start_index"], r["end_index"], r["sentence"])
        for r in df.collect()
    }


def test_inrow_chunking_identical_to_unchunked(spark, code_files):
    """detect_mentions with a tiny chunk bound must emit exactly the
    rows of the unchunked path (offsets relocated, sentence from the
    full text) on the datagen corpus."""
    from mel_tnnt_spark.operators import mentions, metadata
    from mel_tnnt_spark.operators.lineage import enforce_sha_invariant

    valid, _ = enforce_sha_invariant(code_files)
    meta = metadata.mel_stage(valid).cache()
    base = _mention_set(mentions.detect_mentions(meta, max_chunk_chars=10**9))
    chunked = _mention_set(mentions.detect_mentions(meta, max_chunk_chars=300))
    assert base == chunked and base
    meta.unpersist()


def test_chunk_parallel_path_on_giant_doc(spark):
    """A multi-MB single document through detect_mentions_chunked:
    same mentions as the unchunked single-task path, but the work is
    spread over many chunk rows (the straggler fix)."""
    from mel_tnnt_spark.operators import mentions

    sentence = (
        "Grace Hopper wrote code for Apache Software Foundation in Canberra "
        "on 2021-03-15 with budget $1,234.56. "
    )
    giant = sentence * 30_000  # ~3 MB
    df = spark.createDataFrame([("d1", giant)], "doc_id string, preproc_text string")

    unchunked = _mention_set(
        mentions.detect_mentions(df, max_chunk_chars=10**9)
    )
    chunked_df = mentions.detect_mentions_chunked(df, max_chunk_chars=65_536)
    chunked = _mention_set(chunked_df)
    assert chunked == unchunked and len(unchunked) > 100_000 // 4

    n_chunks = mentions.chunk_documents(df, max_chunk_chars=65_536).count()
    assert n_chunks >= 40  # one doc became dozens of distributable rows
