"""TNNT stage: batched mention detection via mapInPandas.

The reference dispatches per-doc, per-model NER through `run_model`
(code/NLP_NER/EntityRecognition.py:997-1018) and materializes mentions
with `get_entity_label_lists` (834-892): per category, a running
`text.find(entity, offset)` assigns offsets (W6) and
`get_context_sentence` (825-832) attaches the sentence.

Here each "model" is a deterministic detector (regex / gazetteer —
FIXTURES.md §2 names them) registered in DETECTORS; real NLP models slot
in behind the same interface (callable text -> [(category, entity,
start, end)]), loaded lazily once per python worker (reference analogue:
one-time model loading, code/MEL/__init__.py:2351-2356).

Execution shape: ONE mapInPandas pass emits mentions for ALL models
(one-to-many, UDTF-like). Arrow batches in, long-form mention rows out —
no per-row Python UDF calls, no driver loops.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from mel_tnnt_spark.config import (
    GAZETTEER_CONLL,
    GAZETTEER_ONTO,
    REGEX_MODEL_PATTERNS,
)
from mel_tnnt_spark.functions.automaton import AhoCorasick
from mel_tnnt_spark.functions.text import py_context_sentence, split_long_text

MENTION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("model", StringType(), False),
        StructField("category", StringType(), False),
        StructField("entity", StringType(), False),
        StructField("start_index", IntegerType(), False),
        StructField("end_index", IntegerType(), False),
        StructField("sentence", StringType(), True),
    ]
)

# MENTION_SCHEMA + the detector's per-(doc, model) emission position —
# opt-in (detect_mentions(emit_ord=True)) for consumers that must
# reproduce the reference's LIST order rather than offset order
# (csv_ner_merge: a find-miss mention carries start=-1 but still holds
# its emitted position in the reference's merged list; r4 advice).
MENTION_ORD_SCHEMA = StructType(
    MENTION_SCHEMA.fields + [StructField("emit_ord", IntegerType(), False)]
)

# span tuple: (category, entity, start, end)
Detector = Callable[[str], list[tuple[str, str, int, int]]]


def _gazetteer_detector(gazetteer: dict[str, str]) -> Detector:
    """Find each gazetteer surface with the reference's running-offset
    semantics (W6, code/NLP_NER/EntityRecognition.py:878-887): offsets
    advance past each match, so duplicates get successive positions."""

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        spans: list[tuple[str, str, int, int]] = []
        for surface, category in gazetteer.items():
            offset = 0
            while True:
                offset = text.find(surface, offset)
                if offset < 0:
                    break
                spans.append((category, surface, offset, offset + len(surface)))
                offset += len(surface)
        return spans

    return detect


def ac_gazetteer_detector(gazetteer: dict[str, str]) -> Detector:
    """Large-vocabulary gazetteer detector (J6 general form): one
    Aho-Corasick pass per document — O(|text| + matches), independent
    of |vocab| — instead of the reference's per-name containment scan
    (code/MEL/DoEE_Species.py:279-393, O(|vocab|*|text|)) or this
    module's naive _gazetteer_detector (same asymptotics, fine at ~20
    aliases, unusable at 10^5).

    Emits exactly the naive detector's spans: per surface, the greedy
    non-overlapping occurrence set in ascending order (the reference's
    find-advance semantics, code/NLP_NER/EntityRecognition.py:878-887)
    — parity is test-pinned against _gazetteer_detector on a 10^4-name
    vocabulary. The automaton builds once per python worker (detector
    registry is worker-cached)."""
    ac = AhoCorasick(list(gazetteer))

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        by_surface: dict[str, list[int]] = {}
        for start, _end, pat in ac.find_all(text):
            by_surface.setdefault(pat, []).append(start)
        spans: list[tuple[str, str, int, int]] = []
        for surface, starts in by_surface.items():
            category = gazetteer[surface]
            prev_end = -1
            for s in sorted(starts):
                if s < prev_end:
                    continue  # overlaps the previous kept occurrence
                prev_end = s + len(surface)
                spans.append((category, surface, s, prev_end))
        return spans

    return detect


def _regex_detector(patterns: dict[str, str]) -> Detector:
    """finditer gives char offsets natively (spaCy-branch analogue:
    entity.start_char/end_char, code/NLP_NER/EntityRecognition.py:846-848)."""
    compiled = {c: re.compile(p) for c, p in patterns.items()}

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        spans = []
        for category, prog in compiled.items():
            for m in prog.finditer(text):
                spans.append((category, m.group(0), m.start(), m.end()))
        return spans

    return detect


def bio_chunks(tagged: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """W5/M10 — run-length grouping of BIO-style tags: consecutive
    tokens whose tag is not 'O' merge into one chunk; 'B-X'/'I-X'
    prefixes normalize to 'X' (reference get_continuous_chunks — four
    near-identical copies at code/NLP_NER/EntityRecognition.py:174-188,
    292-306, 619-633, 724-738; prefix strip e.g. 202-203).

    Returns [(chunk_text, category)] where category is the first
    token's normalized tag (reference takes entity[0][1])."""
    import itertools

    out = []
    for is_entity, group in itertools.groupby(tagged, key=lambda t: t[1] != "O"):
        if not is_entity:
            continue
        toks = list(group)
        cat = toks[0][1]
        cat = cat.split("-", 1)[1] if "-" in cat else cat
        out.append((" ".join(t[0] for t in toks), cat))
    return out


def nltk_category_rescan_spans(
    text: str,
    chunks: list[tuple[str, str]],
    categories: tuple[str, ...],
) -> list[tuple[str, str, int, int]]:
    """The reference NLTK branch's per-category offset RESTART
    (NLTKNer.get_nltk_entities, code/NLP_NER/EntityRecognition.py:
    671-693): for EACH category the running `text.find(entity, offset)`
    scan restarts at offset 0 and re-walks the full chunk list in chunk
    order — unlike the single-pass running offset every other branch
    uses (get_entity_label_lists, 878-887).

    Duck-typed quirks preserved byte-for-byte:
    - a surface appearing under TWO categories gets FIRST-occurrence
      offsets in both per-category scans (each scan starts at 0 and
      knows nothing of the other category's consumption);
    - within one category the scan advances past each match, so a
      category's chunks map to successive occurrences even when the
      chunk's true position lies further right;
    - a failed find KEEPS the item with start=-1 and end=len-1, and the
      offset still advances from -1 (the reference has no found-check).
    Chunks whose category is not in `categories` are dropped, exactly
    like the reference's `if chunk.label() == category` filter."""
    out: list[tuple[str, str, int, int]] = []
    for category in categories:
        offset = 0
        for entity_text, cat in chunks:
            if cat != category:
                continue
            offset = text.find(entity_text, offset)
            out.append((category, entity_text, offset, offset + len(entity_text)))
            offset += len(entity_text)
    return out


def _nltk_rescan_detector() -> Detector:
    """NLTK-branch execution shape with a deterministic chunker:
    tokens starting with 'D' are entity chunks, alternating category
    QCAT/PCAT by occurrence index (a stand-in for ne_chunk's
    context-dependent labels, which is what makes the same surface
    appear under two categories). Offsets come from
    nltk_category_rescan_spans — the per-category restart quirk."""
    cats = ("QCAT", "PCAT")

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        d_toks = [t for t in text.split() if t.startswith("D")]
        chunks = [(t, cats[i % 2]) for i, t in enumerate(d_toks)]
        return nltk_category_rescan_spans(text, chunks, cats)

    return detect


def _token_rule_detector() -> Detector:
    """M2/M4-shaped token-pipeline model: whitespace tokenize, tag each
    token by rule (capitalized word -> 'B-CAPSEQ', else 'O'), BIO-chunk
    the runs (W5), then locate each chunk with the running-offset scan
    (W6, code/NLP_NER/EntityRecognition.py:878-887). This is the
    Stanford/NLTK execution shape with a deterministic tagger."""
    cap = re.compile(r"^[A-Z][a-z]+$")

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        tagged = [(tok, "B-CAPSEQ" if cap.match(tok) else "O") for tok in text.split()]
        spans = []
        offset = 0
        for chunk_text, cat in bio_chunks(tagged):
            offset = text.find(chunk_text, offset)
            if offset < 0:
                offset = 0
                continue
            spans.append((cat, chunk_text, offset, offset + len(chunk_text)))
            offset += len(chunk_text)
        return spans

    return detect


class VectorizedTokenModel:
    """M1-shaped REAL-MODEL execution demo: a numpy token classifier
    with the exact runtime shape of a heavy NLP model behind the
    Detector interface — lazy one-time weight load per python worker
    (reference analogue: one-time model loading,
    code/MEL/__init__.py:2351-2356), Arrow-BATCH vectorized inference
    (one matmul over every token of every doc in the batch — the
    flair/BERT batch-predict shape, code/NLP_NER/
    EntityRecognition.py:517-580), then BIO chunking + running-offset
    location like any token model.

    The weights are deterministic and encode the title-case rule, so
    its output is byte-identical to token_rule_model — which is the
    parity test proving a real model (spaCy, flair, BERT) slots in
    behind the same interface with no plan change (still ONE
    MapInPandas stage)."""

    _WEIGHTS = None  # class-level: one load per python worker process

    @classmethod
    def _load(cls):
        if cls._WEIGHTS is None:
            import numpy as np

            # (features x classes): ENT logit = f_upper + f_lower_rest - 1.5
            cls._WEIGHTS = np.array([[1.0, 0.0], [1.0, 0.0], [-1.5, 0.0]])
        return cls._WEIGHTS

    def detect_batch(self, texts: list[str]) -> list[list[tuple[str, str, int, int]]]:
        import numpy as np

        w = self._load()
        toks_per_doc = [t.split() if t else [] for t in texts]
        flat = [tok for toks in toks_per_doc for tok in toks]
        if not flat:
            return [[] for _ in texts]
        f_upper = np.fromiter(("A" <= t[0] <= "Z" for t in flat), float, len(flat))
        f_rest = np.fromiter(
            (len(t) >= 2 and all("a" <= c <= "z" for c in t[1:]) for t in flat),
            float,
            len(flat),
        )
        x = np.stack([f_upper, f_rest, np.ones(len(flat))], axis=1)
        is_ent = (x @ w)[:, 0] > (x @ w)[:, 1]  # vectorized "inference"
        out: list[list[tuple[str, str, int, int]]] = []
        pos = 0
        for text, toks in zip(texts, toks_per_doc):
            tags = [
                (tok, "B-CAPSEQ" if is_ent[pos + i] else "O") for i, tok in enumerate(toks)
            ]
            pos += len(toks)
            spans: list[tuple[str, str, int, int]] = []
            offset = 0
            for chunk_text, cat in bio_chunks(tags):
                offset = text.find(chunk_text, offset)
                if offset < 0:
                    offset = 0
                    continue
                spans.append((cat, chunk_text, offset, offset + len(chunk_text)))
                offset += len(chunk_text)
            out.append(spans)
        return out

    def __call__(self, text: str) -> list[tuple[str, str, int, int]]:
        return self.detect_batch([text])[0]


class HeavyEmbeddingTokenModel(VectorizedTokenModel):
    """Memory-pressure twin of VectorizedTokenModel: identical output,
    but the lazy per-worker load ALSO materializes a configurable
    multi-GB float32 block standing in for real model weights (no
    model wheels ship in this container — sanctioned; this closes the
    remaining gap: per-worker memory behavior under a heavy model was
    unmeasured). scripts/heavy_model_probe.py drives it over the 100k
    corpus and records per-worker peak RSS, load counts (must be <= 1
    per worker — the one-time-load claim, reference analogue
    code/MEL/__init__.py:2351-2356), and throughput into BENCH.md. The
    block is gathered on every batch so it stays resident like real
    weights would."""

    _BLOCK = None  # class-level: one allocation per python worker
    _LOADS = 0

    def __init__(self, mb: int = 1024):
        self._mb = mb

    @classmethod
    def _load_block(cls, mb: int):
        if cls._BLOCK is None:
            import numpy as np

            n = mb * 1024 * 1024 // 4
            # arange writes every page -> genuinely resident, and
            # deterministic (no RNG)
            cls._BLOCK = np.arange(n, dtype=np.float32)
            cls._LOADS += 1
        return cls._BLOCK

    def detect_batch(self, texts: list[str]) -> list[list[tuple[str, str, int, int]]]:
        block = self._load_block(self._mb)
        # touch a spread of the block each batch (embedding-gather shape)
        stride = max(1, len(block) // 97)
        float(block[::stride].sum())
        return super().detect_batch(texts)


_SPACY_CACHE: dict[str, object] = {}


def spacy_detector(model_name: str = "en_core_web_sm") -> Detector:
    """M1 — an actual spaCy pipeline behind the Detector interface
    (reference spaCy branch: entity.start_char/end_char,
    code/NLP_NER/EntityRecognition.py:846-848). The pipeline loads
    lazily ONCE per python worker (module-level cache + worker reuse);
    raises ImportError where spaCy is absent (this sandbox) — the
    integration test skips accordingly."""

    def _nlp():
        if model_name not in _SPACY_CACHE:
            import spacy  # heavyweight: import inside the worker only

            _SPACY_CACHE[model_name] = spacy.load(model_name)
        return _SPACY_CACHE[model_name]

    def detect(text: str) -> list[tuple[str, str, int, int]]:
        return [
            (e.label_, e.text, e.start_char, e.end_char) for e in _nlp()(text).ents
        ]

    def detect_batch(texts: list[str]) -> list[list[tuple[str, str, int, int]]]:
        nlp = _nlp()
        return [
            [(e.label_, e.text, e.start_char, e.end_char) for e in doc.ents]
            for doc in nlp.pipe(texts)  # spaCy's own batched inference
        ]

    detect.detect_batch = detect_batch  # type: ignore[attr-defined]
    return detect


# Worker-side registry; built lazily so heavyweight models would only
# load in the executor python worker, once, and be reused across batches.
_DETECTOR_CACHE: dict[str, Detector] = {}


def _detectors() -> dict[str, Detector]:
    if not _DETECTOR_CACHE:
        _DETECTOR_CACHE["regex_model"] = _regex_detector(REGEX_MODEL_PATTERNS)
        _DETECTOR_CACHE["gazetteer_conll_model"] = _gazetteer_detector(GAZETTEER_CONLL)
        _DETECTOR_CACHE["gazetteer_onto_model"] = _gazetteer_detector(GAZETTEER_ONTO)
        _DETECTOR_CACHE["token_rule_model"] = _token_rule_detector()
        _DETECTOR_CACHE["nltk_rescan_model"] = _nltk_rescan_detector()
        _DETECTOR_CACHE["vectorized_token_model"] = VectorizedTokenModel()
        import os

        heavy_mb = os.environ.get("SPARK_GRAFT_HEAVY_MB")
        if heavy_mb:  # opt-in: the memory-pressure probe only
            _DETECTOR_CACHE["heavy_embedding_model"] = HeavyEmbeddingTokenModel(
                int(heavy_mb)
            )
    return _DETECTOR_CACHE


def detect_mentions_py(doc_id: str, text: str, models: tuple[str, ...]) -> list[dict]:
    """Run the registered detectors over one preprocessed text; emit the
    reference mention schema ({entity, start_index, end_index, sentence},
    code/NLP_NER/EntityRecognition.py:842-847)."""
    out = []
    registry = _detectors()
    for model in models:
        for category, entity, start, end in registry[model](text):
            out.append(
                {
                    "doc_id": doc_id,
                    "model": model,
                    "category": category,
                    "entity": entity,
                    "start_index": start,
                    "end_index": end,
                    "sentence": py_context_sentence(start, text),
                }
            )
    return out


class SentenceLookup:
    """O(log n) version of py_context_sentence: precompute the running
    sentence-boundary totals once per doc, bisect per mention. Exactly
    the reference semantics (split on '.', +1 per period,
    code/NLP_NER/EntityRecognition.py:825-832)."""

    __slots__ = ("parts", "totals")

    def __init__(self, text: str):
        import itertools

        self.parts = text.split(".")
        self.totals = list(itertools.accumulate(len(p) + 1 for p in self.parts))

    def __call__(self, start_char: int) -> str | None:
        from bisect import bisect_left

        i = bisect_left(self.totals, start_char + 1)
        return self.parts[i] if i < len(self.parts) else None


def detect_mentions(
    df: DataFrame,
    models: tuple[str, ...] = ("regex_model", "gazetteer_conll_model", "gazetteer_onto_model"),
    text_col: str = "preproc_text",
    max_chunk_chars: int = 65_536,
    preprocess: bool = False,
    emit_ord: bool = False,
) -> DataFrame:
    """mapInPandas over (doc_id, text) batches -> long mention rows.

    emit_ord=True appends the detector's per-(doc, model) emission
    position (0-based, counted across chunk pieces in model order —
    the reference scans the whole text per model) as `emit_ord`, for
    consumers that need the reference's LIST order where offset order
    diverges from it (a running text.find miss emits start=-1 mid-list,
    code/NLP_NER/EntityRecognition.py:671-693).

    Each `models` entry is a registered detector NAME or an inline
    ("name", detector) pair — the pair's callable is pickled with the
    task closure, so a custom/trained model slots in without touching
    the worker-side registry (the M1 slot-in contract, and how tests
    pin emission-order semantics the shipped text-derived chunkers
    cannot produce, e.g. a mid-list find miss).

    Only the two needed columns cross the Arrow boundary (column pruning
    by construction); batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch. The hot loop builds
    columnar lists (no per-row dicts) and shares one SentenceLookup per
    doc; equivalence with the reference semantics is pinned by the
    golden tests.

    Texts longer than max_chunk_chars are recursively punctuation-split
    (split_long_text — the reference's sequence-length bound,
    code/NLP_NER/EntityRecognition.py:649-661) and detected per chunk
    with offsets relocated by the chunk start; the sentence context is
    computed from the FULL text, so the output is identical to the
    unchunked path for any entity that does not straddle a chunk
    boundary (property-tested). This bounds per-call detector cost; for
    corpora with multi-GB single documents use detect_mentions_chunked,
    which spreads one document's chunks across tasks.

    preprocess=True fuses F1+F2+F3 (clean + NER preprocess, byte-equal
    py twins of the column expressions — equivalence-tested) into THIS
    stage, so raw `content` crosses the Arrow boundary once instead of
    three times (in/out of the clean-text pandas UDF, then in again
    here) — at 100 TB the content bytes are the transfer bill. Offsets
    and sentences refer to the preprocessed text either way."""
    from mel_tnnt_spark.functions.text import clean_preprocess_series

    narrow = df.select("doc_id", F.col(text_col).alias("_text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import defaultdict

        registry = _detectors()
        schema = MENTION_ORD_SCHEMA if emit_ord else MENTION_SCHEMA
        cols = [f.name for f in schema.fields]
        resolved = [
            (m, registry[m]) if isinstance(m, str) else (m[0], m[1]) for m in models
        ]
        per_doc = [(n, d) for n, d in resolved if not hasattr(d, "detect_batch")]
        batched = [(n, d) for n, d in resolved if hasattr(d, "detect_batch")]
        for pdf in batches:
            c_doc: list = []
            c_model: list = []
            c_cat: list = []
            c_ent: list = []
            c_s: list = []
            c_e: list = []
            c_sent: list = []
            c_ord: list = []
            doc_ids = list(pdf["doc_id"])
            if preprocess:
                texts = clean_preprocess_series(pdf["_text"]).tolist()
            else:
                texts = [t if t else "" for t in pdf["_text"]]
            # batch-capable models: ONE vectorized inference call per
            # Arrow batch (sequence bounding is the model's own job,
            # like the reference's per-model BERT splitter)
            batch_spans = {n: d.detect_batch(texts) for n, d in batched}
            for i, (doc_id, text) in enumerate(zip(doc_ids, texts)):
                if not text:
                    continue
                lookup = SentenceLookup(text)
                if len(text) > max_chunk_chars:
                    pieces = split_long_text(text, max_chunk_chars)
                else:
                    pieces = [(0, text)]
                # per-(doc, model) emission counter: the piece-major
                # append order below still numbers each model's
                # mentions in its own sequential-scan order
                ords: dict[str, int] = defaultdict(int)
                for base, piece in pieces:
                    for model, det in per_doc:
                        for category, entity, start, end in det(piece):
                            c_doc.append(doc_id)
                            c_model.append(model)
                            c_cat.append(category)
                            c_ent.append(entity)
                            c_s.append(base + start)
                            c_e.append(base + end)
                            c_sent.append(lookup(base + start))
                            if emit_ord:
                                c_ord.append(ords[model])
                                ords[model] += 1
                for model, _det in batched:
                    for category, entity, start, end in batch_spans[model][i]:
                        c_doc.append(doc_id)
                        c_model.append(model)
                        c_cat.append(category)
                        c_ent.append(entity)
                        c_s.append(start)
                        c_e.append(end)
                        c_sent.append(lookup(start))
                        if emit_ord:
                            c_ord.append(ords[model])
                            ords[model] += 1
            data = [c_doc, c_model, c_cat, c_ent, c_s, c_e, c_sent]
            if emit_ord:
                data.append(c_ord)
            yield pd.DataFrame(dict(zip(cols, data)))

    return narrow.mapInPandas(run, MENTION_ORD_SCHEMA if emit_ord else MENTION_SCHEMA)


_CELL_SEP = "\x1f"  # unit separator: composite cell-id delimiter


def csv_ner_merge(
    cells: DataFrame,
    models: tuple[str, ...] = ("token_rule_model",),
    doc_col: str = "doc_id",
    idx_col: str = "cell_index",
    text_col: str = "cell_text",
) -> DataFrame:
    """A14/M14 — the reference's CSV NER merge
    (NER.get_csv_ner_from_models, code/NLP_NER/EntityRecognition.py:
    936-992): NER runs per CSV cell (`for text in all_text`), and per
    (model, category) the per-cell mention lists CONCATENATE in cell
    order — a category's merged list interleaves across cells exactly
    as the cells appear in the document, and the per-category
    `number-of-entities` stat counts the merged list (985-992).

    Relational formulation: each cell becomes its own detection doc
    (composite id doc␟cell so only two columns cross the Arrow
    boundary, same as detect_mentions), then
    - `merge_ord`  = row_number over (doc, model, category) ordered by
      (cell_index, emit_ord) — cell order first, the detector's OWN
      emission order within a cell (detect_mentions(emit_ord=True)).
      Offset order is NOT a safe stand-in: a running text.find miss
      emits start=-1 mid-list, which would sort before earlier
      mentions and diverge from the reference merged-list position
      (r4 advice; pinned in test_csv_ner_merge_find_miss_order);
    - `category_count` = the reference's number-of-entities.
    Both are functions of the DATA (cell_index), never of partition or
    row order, so the output is invariant under shuffled input
    (property-pinned in test_csv_ner_merge_order_stability).
    Offsets stay cell-relative, as in the reference (NER saw only the
    cell text)."""
    from pyspark.sql.window import Window

    src = cells.select(
        F.concat_ws(
            _CELL_SEP,
            F.col(doc_col).cast("string"),
            F.col(idx_col).cast("string"),
        ).alias("doc_id"),
        F.col(text_col).alias("_cell_text"),
    )
    m = detect_mentions(src, models=models, text_col="_cell_text", emit_ord=True)
    # Decompose from the RIGHT: exactly one separator + index was
    # appended, so the last part is the cell index and rejoining the
    # rest reconstructs the doc id EXACTLY even if it contains the
    # separator character itself (round-4 review find: getItem(0)
    # truncated such ids and nulled the cell index).
    parts = F.split(F.col("doc_id"), _CELL_SEP)
    m = m.select(
        F.array_join(
            F.slice(parts, F.lit(1), F.size(parts) - 1), _CELL_SEP
        ).alias(doc_col),
        F.element_at(parts, -1).cast("int").alias(idx_col),
        "model",
        "category",
        "entity",
        "start_index",
        "end_index",
        "sentence",
        "emit_ord",
    )
    wo = Window.partitionBy(doc_col, "model", "category").orderBy(idx_col, "emit_ord")
    wc = Window.partitionBy(doc_col, "model", "category")
    return (
        m.withColumn("merge_ord", F.row_number().over(wo))
        .withColumn("category_count", F.count("*").over(wc))
        .drop("emit_ord")
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("chunk_start", IntegerType(), False),
        StructField("chunk_text", StringType(), False),
    ]
)


def chunk_documents(
    df: DataFrame, text_col: str = "preproc_text", max_chunk_chars: int = 1_048_576
) -> DataFrame:
    """Explode giant documents into (doc_id, chunk_start, chunk_text)
    rows via split_long_text. This is the STRAGGLER fix: one 50 MB doc
    becomes ~50 rows that a repartition can spread over the cluster,
    instead of one task pinned on one core for the whole stage."""
    narrow = df.select("doc_id", F.col(text_col).alias("_text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            c_doc: list = []
            c_start: list = []
            c_text: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                if not text:
                    continue
                for base, piece in split_long_text(text, max_chunk_chars):
                    c_doc.append(doc_id)
                    c_start.append(base)
                    c_text.append(piece)
            yield pd.DataFrame({"doc_id": c_doc, "chunk_start": c_start, "chunk_text": c_text})

    return narrow.mapInPandas(run, CHUNK_SCHEMA)


def detect_mentions_chunked(
    df: DataFrame,
    models: tuple[str, ...] = ("regex_model", "gazetteer_conll_model", "gazetteer_onto_model"),
    text_col: str = "preproc_text",
    max_chunk_chars: int = 1_048_576,
    n_partitions: int | None = None,
) -> DataFrame:
    """Chunk-parallel mention detection for skewed corpora: chunk ->
    repartition (spreads a giant doc's chunks across tasks) -> detect
    per chunk -> relocate offsets by chunk_start.

    Sentence context is computed from the chunk. Chunks start right
    after a separator, so at '.'-level splits the context sentence is
    byte-identical to the full-text one (split_long_text docstring);
    deeper-level splits may truncate the context at a chunk edge — the
    documented trade for unbounded document sizes (the reference drops
    such text entirely)."""
    chunks = chunk_documents(df, text_col, max_chunk_chars)
    chunks = chunks.repartition(
        n_partitions or chunks.sparkSession.sparkContext.defaultParallelism,
        "doc_id",
        "chunk_start",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        registry = _detectors()
        cols = [f.name for f in MENTION_SCHEMA.fields]
        for pdf in batches:
            c_doc: list = []
            c_model: list = []
            c_cat: list = []
            c_ent: list = []
            c_s: list = []
            c_e: list = []
            c_sent: list = []
            for doc_id, base, text in zip(
                pdf["doc_id"], pdf["chunk_start"], pdf["chunk_text"]
            ):
                if not text:
                    continue
                base = int(base)
                lookup = SentenceLookup(text)
                for model in models:
                    for category, entity, start, end in registry[model](text):
                        c_doc.append(doc_id)
                        c_model.append(model)
                        c_cat.append(category)
                        c_ent.append(entity)
                        c_s.append(base + start)
                        c_e.append(base + end)
                        c_sent.append(lookup(start))
            yield pd.DataFrame(
                dict(zip(cols, [c_doc, c_model, c_cat, c_ent, c_s, c_e, c_sent]))
            )

    return chunks.mapInPandas(run, MENTION_SCHEMA)


def mention_stats(mentions: DataFrame) -> DataFrame:
    """A4 — per-(doc, model, category) entity counts, the `_stats`
    number-of-entities map (code/NLP_NER/EntityRecognition.py:814-823)
    in long form. Wall-clock stats are runtime telemetry, not data."""
    return (
        mentions.groupBy("doc_id", "model", "category")
        .count()
        .withColumnRenamed("count", "number_of_entities")
    )


def ensemble_intersect(mentions: DataFrame, model_a: str, model_b: str) -> DataFrame:
    """J7 — model-ensemble intersection (spacy_model_ensemble,
    code/NLP_NER/EntityRecognition.py:1095-1150): keep mentions found by
    BOTH models at the same span. The reference compares items for
    equality per category; spans + entity text equality is that same
    predicate relationally.

    Category spaces differ per model, so the join key is the span, not
    the raw category (the reference compares within the model's own
    category lists; for cross-space ensembles canonicalize first)."""
    a = mentions.where(F.col("model") == model_a).select(
        "doc_id", "entity", "start_index", "end_index", F.col("category").alias("category_a")
    )
    b = mentions.where(F.col("model") == model_b).select(
        "doc_id", "entity", "start_index", "end_index", F.col("category").alias("category_b")
    )
    return a.join(b, ["doc_id", "entity", "start_index", "end_index"], "inner")
