"""M12/M13 — POS-tag + dependency-parse and coreference enrichment.

Reference shapes: spaCy per-token {lemma,pos,tag,alpha,starts,ends} +
deprel grouped by sentence (spacy_PT_DP_task.py:23-72,
stanza_PT_DP_task.py:24-55) and CoreNLP coref chains over
tokenize,ssplit,pos,lemma,ner,depparse,coref annotators
(coref_coreNLP.py:18-45).

Like M1-M9, the models here are DETERMINISTIC STAND-INS behind the
same batched interface (BASELINE-sanctioned: heavy model libs are not
in this container). The rule tagger/linker produces the reference's
exact output schema — per-token offsets, sentence grouping, chain
representatives — so a spaCy/stanza-backed implementation slots in by
replacing only the per-batch kernel (see VectorizedTokenModel in
mentions.py for the proven slot-in pattern).

The reference's size-based thread selection (coref_coreNLP.py
file_boundary -> regular/large thread count) is a single-node
scheduling knob; its Spark equivalent is the giant-document chunking +
repartition already applied in the mention stage, so it is not
re-modeled here.

Execution shape: ONE mapInPandas per operator; long token/mention rows
out (columnar, partition-friendly), never nested per-doc JSON blobs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

POS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("sent_idx", IntegerType(), False),
        StructField("token", StringType(), False),
        StructField("lemma", StringType(), False),
        StructField("pos", StringType(), False),
        StructField("tag", StringType(), False),
        StructField("alpha", BooleanType(), False),
        StructField("starts", IntegerType(), False),
        StructField("ends", IntegerType(), False),
        StructField("dep", StringType(), False),
    ]
)

COREF_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("chain_id", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("starts", IntegerType(), False),
        StructField("ends", IntegerType(), False),
        StructField("representative", StringType(), False),
    ]
)

_TOKEN = re.compile(r"[A-Za-z0-9_']+|[^\sA-Za-z0-9_']")
_SENT_END = re.compile(r"(?<=[.!?])\s+")

_DET = frozenset("a an the this that these those".split())
_ADP = frozenset("in on at of for with from to by over under into".split())
_PRON = frozenset("i you he she it we they him her them his hers its their me us".split())
_CCONJ = frozenset("and or but nor yet so".split())
_AUX = frozenset("is are was were be been am being has have had do does did will would can could shall should may might must".split())
_NOUN_SUFFIX = ("tion", "ness", "ment", "ity", "ance", "ence", "ship", "ism")
_VERB_IRREG = frozenset(
    "built made said went got took came saw knew gave found told ran held "
    "kept wrote read met paid sent left lost won bought brought thought".split()
)

# UD pos -> PTB-ish fine tag (the spaCy token.tag_ analogue)
_TAG = {
    "NOUN": "NN", "PROPN": "NNP", "VERB": "VB", "AUX": "MD", "ADJ": "JJ",
    "ADV": "RB", "DET": "DT", "ADP": "IN", "PRON": "PRP", "CCONJ": "CC",
    "NUM": "CD", "PUNCT": ".", "X": "FW",
}


def py_lemma(token: str) -> str:
    """Deterministic suffix stemmer (stand-in for the model lemmatizer)."""
    w = token.lower()
    for suf, repl in (("ing", ""), ("ies", "y"), ("ed", ""), ("s", "")):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: -len(suf)] + repl
            break
    return w


def py_pos(token: str, sent_initial: bool) -> str:
    w = token.lower()
    if not any(c.isalnum() for c in token):
        return "PUNCT"
    if w.replace(".", "").replace(",", "").isdigit():
        return "NUM"
    if w in _DET:
        return "DET"
    if w in _ADP:
        return "ADP"
    if w in _PRON:
        return "PRON"
    if w in _CCONJ:
        return "CCONJ"
    if w in _AUX:
        return "AUX"
    if token[0].isupper() and not sent_initial:
        return "PROPN"
    if w.endswith("ly"):
        return "ADV"
    if w in _VERB_IRREG or w.endswith(("ing", "ed", "ize", "ise", "ate")):
        return "VERB"
    if w.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic")):
        return "ADJ"
    if w.endswith(_NOUN_SUFFIX):
        return "NOUN"
    return "NOUN"


def py_pos_tag(text: str) -> list[dict]:
    """Whole-document deterministic tagger: sentence split, per-token
    {lemma,pos,tag,alpha,starts,ends,dep} with ABSOLUTE character
    offsets (token.idx semantics). Shallow deps: first VERB/AUX of a
    sentence = ROOT, nouns before it = nsubj, after = obj, DET = det,
    ADJ = amod, ADP = prep, else dep."""
    rows: list[dict] = []
    sent_start = 0
    boundaries = [m.end() for m in _SENT_END.finditer(text)] + [len(text)]
    for sent_idx, sent_end in enumerate(boundaries):
        sent = text[sent_start:sent_end]
        toks = [(m.group(0), sent_start + m.start()) for m in _TOKEN.finditer(sent)]
        root_seen = False
        tagged = []
        for i, (tok, off) in enumerate(toks):
            pos = py_pos(tok, sent_initial=(i == 0))
            tagged.append((tok, off, pos))
        # sentence-initial capitalized word followed by a PROPN is part
        # of the name ("Alice Johnson built ..." -> Alice is PROPN)
        if (
            len(tagged) >= 2
            and tagged[0][2] == "NOUN"
            and tagged[0][0][0].isupper()
            and tagged[1][2] == "PROPN"
        ):
            tagged[0] = (tagged[0][0], tagged[0][1], "PROPN")
        for tok, off, pos in tagged:
            if pos in ("VERB", "AUX") and not root_seen:
                dep, root_seen = "ROOT", True
            elif pos in ("NOUN", "PROPN", "PRON"):
                dep = "nsubj" if not root_seen else "obj"
            elif pos == "DET":
                dep = "det"
            elif pos == "ADJ":
                dep = "amod"
            elif pos == "ADP":
                dep = "prep"
            else:
                dep = "dep"
            rows.append(
                {
                    "sent_idx": sent_idx,
                    "token": tok,
                    "lemma": py_lemma(tok),
                    "pos": pos,
                    "tag": _TAG.get(pos, "NN"),
                    "alpha": tok.isalpha(),
                    "starts": off,
                    "ends": off + len(tok),
                    "dep": dep,
                }
            )
        sent_start = sent_end
    return rows


_PRONOUN = frozenset("he she it they him her them his hers its their".split())


def py_coref_chains(text: str) -> list[dict]:
    """Nearest-antecedent coref stand-in: consecutive PROPN tokens form
    entity mentions; each pronoun links to the most recent mention.
    chain_id = start offset of the chain's first mention;
    representative = that mention's text (CoreNLP representative-
    mention analogue)."""
    rows: list[dict] = []
    tagged = py_pos_tag(text)
    cur: list[dict] = []  # consecutive-PROPN run
    last: dict | None = None  # most recent entity mention row
    chains: dict[str, int] = {}  # mention text -> chain_id (first start)

    def flush() -> None:
        nonlocal cur, last
        if cur:
            starts, ends = cur[0]["starts"], cur[-1]["ends"]
            mention = text[starts:ends]
            # repeated identical names join one chain (CoreNLP merges
            # exact-match mentions), keyed by first-occurrence offset
            chain_id = chains.setdefault(mention, starts)
            row = {
                "chain_id": chain_id,
                "mention": mention,
                "starts": starts,
                "ends": ends,
                "representative": mention,
            }
            rows.append(row)
            last = row
            cur = []

    for t in tagged:
        if t["pos"] == "PROPN":
            if cur and t["starts"] > cur[-1]["ends"] + 1:
                flush()
            cur.append(t)
            continue
        flush()
        if t["token"].lower() in _PRONOUN and last is not None:
            rows.append(
                {
                    "chain_id": last["chain_id"],
                    "mention": t["token"],
                    "starts": t["starts"],
                    "ends": t["ends"],
                    "representative": last["representative"],
                }
            )
    flush()
    return rows


def _long_rows(df: DataFrame, text_col: str, kernel, schema: StructType) -> DataFrame:
    narrow = df.select("doc_id", text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out: list[dict] = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                for row in kernel(text or ""):
                    out.append({"doc_id": doc_id, **row})
            yield pd.DataFrame(out, columns=cols)

    return narrow.mapInPandas(run, schema)


def pos_tag_tokens(df: DataFrame, text_col: str = "content") -> DataFrame:
    """M12 — long (doc_id, sent_idx, token, lemma, pos, tag, alpha,
    starts, ends, dep) rows; one Arrow crossing."""
    return _long_rows(df, text_col, py_pos_tag, POS_SCHEMA)


def coref_resolve(df: DataFrame, text_col: str = "content") -> DataFrame:
    """M13 — long coref-chain mention rows; one Arrow crossing."""
    return _long_rows(df, text_col, py_coref_chains, COREF_SCHEMA)
