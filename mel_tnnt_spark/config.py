"""Static configuration: the rebuild's equivalents of the reference's
config.json tables, expressed as plain Python constants that are
broadcast / inlined into Spark plans.

Citations:
- Regular-Expressions  -> /root/reference/code/MEL/config.json:405-413
- MIME-Types           -> /root/reference/code/MEL/config.json:372-378
- Extension-Mappings   -> /root/reference/code/MEL/config.json:379-392
- label-classification -> /root/reference/code/NLP_NER_API/config.json:228-513
"""

from __future__ import annotations

# --- MEL pattern matching (A3). Same pattern strings as the reference's
# Regular-Expressions table; applied with re.ASCII|re.MULTILINE
# (code/MEL/__init__.py:960-961).
REGULAR_EXPRESSIONS: dict[str, str] = {
    "e-mails": r"[\w\.-]+@[\w\.-]+\.\w+",
    "phone-numbers": r"[\+\(]?[0-9][0-9 .\-\(\)]{8,}[0-9]",
    "URLs": (
        r"(https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]"
        r"\.[^\s]{2,}|www\.[a-zA-Z0-9][a-zA-Z0-9-]+[a-zA-Z0-9]\.[^\s]{2,}|"
        r"https?:\/\/(?:www\.|(?!www))[a-zA-Z0-9]+\.[^\s]{2,}|"
        r"www\.[a-zA-Z0-9]+\.[^\s]{2,})"
    ),
    "all-caps": r"\b([A-Z]+)(\-|\/)?([A-Z]+)\b",
    "start-with-caps": r"\b[A-Z][a-z]{1,}?\b",
    "IDs-start-with-year": r"(2\d\d{2})(\/|\-)(\d+)",
    "money-amounts-with-decimals": (
        r"(\$)\s?([0-9]{1,3},([0-9]{3},)*[0-9]{3}|[0-9]+)(\.[0-9][0-9])?"
    ),
}

# --- MIME classification (F13): extension -> MIME. Reference's explicit
# table plus entries for the source-code payload (`lang` column).
MIME_TYPES: dict[str, str] = {
    "XLW": "application/vnd.ms-excel",
    "MSG": "application/vnd.ms-outlook",
    "DBF": "application/dbf",
    "DWG": "application/autocad_dwg",
    "RTF": "text/rtf",
    # source-code payload
    "PY": "text/x-python",
    "JAVA": "text/x-java-source",
    "GO": "text/x-go",
    "RS": "text/x-rust",
    "JS": "text/javascript",
    "MD": "text/markdown",
    "TXT": "text/plain",
    "JSON": "application/json",
    "XML": "application/xml",
    "HTML": "text/html",
    "CSV": "text/csv",
    "YAML": "application/yaml",
    "YML": "application/yaml",
}

# --- Extractor dispatch (reference Extension-Mappings + extract_ext_info
# dynamic dispatch, code/MEL/__init__.py:2016-2022). For the source-code
# payload the leaf extractors are per-language structural extractors.
EXTENSION_MAPPINGS: dict[str, str] = {
    "PY": "PYTHON",
    "JAVA": "JAVA",
    "GO": "GO",
    "RS": "RUST",
    "JS": "JS",
    "MD": "MARKDOWN",
    "TXT": "TXT",
    "JSON": "JSON",
    "XML": "TXT",
    "HTML": "TXT",
    "CSV": "CSV",
    "YAML": "TXT",
    "YML": "TXT",
}

# Extensions treated as plain text (reference Text-based-Files,
# code/MEL/config.json:414 via code/MEL/__init__.py:1923-1924).
TEXT_BASED_EXTENSIONS = {
    "TXT", "CSV", "XML", "PRJ", "HTML", "HTM", "JSON", "RTF",
    "PY", "JAVA", "GO", "RS", "JS", "MD", "YAML", "YML",
}

# --- Keyword-extraction stopwords (A2). The reference uses
# nltk.corpus.stopwords ('english'); that corpus isn't shippable here, so
# we pin an explicit frozen list (standard English function words). The
# list is part of the engine contract: tests and oracles share it.
STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "did", "do",
    "does", "doing", "down", "during", "each", "few", "for", "from",
    "further", "had", "has", "have", "having", "he", "her", "here", "hers",
    "him", "his", "how", "i", "if", "in", "into", "is", "it", "its",
    "itself", "just", "me", "more", "most", "my", "no", "nor", "not", "now",
    "of", "off", "on", "once", "only", "or", "other", "our", "out", "over",
    "own", "same", "she", "should", "so", "some", "such", "than", "that",
    "the", "their", "them", "then", "there", "these", "they", "this",
    "those", "through", "to", "too", "under", "until", "up", "very", "was",
    "we", "were", "what", "when", "where", "which", "while", "who", "whom",
    "why", "will", "with", "you", "your",
)

# --- Detector registry: the rebuild's deterministic "models". Mirrors the
# reference's model diversity (conll PER/LOC/ORG/MISC vs ontonotes
# 18-label, code/NLP_NER/NLP-NER-config.json) with gazetteer + regex
# detectors so P/R is exactly testable without model weights.
MODELS = ("regex_model", "gazetteer_conll_model", "gazetteer_onto_model")

# Gazetteers: surface form -> raw category, per model. Surfaces are found
# in preprocessed text with the reference's running-offset semantics
# (code/NLP_NER/EntityRecognition.py:878-887).
GAZETTEER_CONLL: dict[str, str] = {
    "Grace Hopper": "PER",
    "Alan Turing": "PER",
    "Ada Lovelace": "PER",
    "Margaret Hamilton": "PER",
    "Apache Software Foundation": "ORG",
    "Mozilla": "ORG",
    "CSIRO": "ORG",
    "Canberra": "LOC",
    "Sydney": "LOC",
    "Zurich": "LOC",
    "Unicode": "MISC",
    "Apache License": "MISC",
}

GAZETTEER_ONTO: dict[str, str] = {
    "Grace Hopper": "PERSON",
    "Alan Turing": "PERSON",
    "Ada Lovelace": "PERSON",
    "Margaret Hamilton": "PERSON",
    "Apache Software Foundation": "ORG",
    "Mozilla": "ORG",
    "CSIRO": "ORG",
    "Canberra": "GPE",
    "Sydney": "GPE",
    "Zurich": "GPE",
    "Apache License": "LAW",
    "MIT License": "LAW",
    "Python": "LANGUAGE",
    "Java": "LANGUAGE",
}

# regex_model: pattern-name categories (offsets from finditer on the
# PREPROCESSED text — NER.get_text_values runs preprocess_text first,
# code/NLP_NER/EntityRecognition.py:894-898, which strips @ $ - < > etc.,
# so the patterns target the post-preprocess surface forms).
REGEX_MODEL_PATTERNS: dict[str, str] = {
    "EMAIL": r"\b[\w.]+\.(?:org|com|net|mil|au|edu|io)\b",
    "URL": r"https?://\S+",
    "DATE": r"\b(?:19|20)\d{2}\b",
    "MONEY": r"\b\d{1,3}(?:,\d{3})+(?:\.\d{2})?\b",
}

# --- Canonical category space (J9): (model, raw category) -> tnnt:* label.
# Same shape as the reference's label-classification table, restricted to
# the registered detector models.
LABEL_CLASSIFICATION: dict[str, dict[str, str]] = {
    "tnnt:Person": {
        "gazetteer_conll_model": "PER",
        "gazetteer_onto_model": "PERSON",
    },
    "tnnt:Organisation": {
        "gazetteer_conll_model": "ORG",
        "gazetteer_onto_model": "ORG",
    },
    "tnnt:Location": {
        "gazetteer_conll_model": "LOC",
    },
    "tnnt:GPE": {
        "gazetteer_onto_model": "GPE",
    },
    "tnnt:Law": {
        "gazetteer_onto_model": "LAW",
    },
    "tnnt:Language": {
        "gazetteer_onto_model": "LANGUAGE",
    },
    "tnnt:Date": {
        "regex_model": "DATE",
    },
    "tnnt:Money": {
        "regex_model": "MONEY",
    },
    "tnnt:Misc": {
        "gazetteer_conll_model": "MISC",
        "regex_model": "EMAIL",
    },
    "tnnt:URL": {
        "regex_model": "URL",
    },
}


def label_classification_rows() -> list[tuple[str, str, str]]:
    """Flatten LABEL_CLASSIFICATION to (model, category, tnnt_label) rows
    for the broadcast dim table (reference applies it at
    code/NLP_NER_API/analysis/aggregation.py:229-242)."""
    rows = []
    for tnnt, by_model in LABEL_CLASSIFICATION.items():
        for model, raw in by_model.items():
            rows.append((model, raw, tnnt))
    return rows


# --- Alias dictionary (J8): broadcast side of entity linking. Includes an
# ambiguous alias ("Mercury"-style: "Apache" -> 2 candidates) and surface
# variants that only connected-components unifies.
ALIAS_DICT: list[dict[str, object]] = [
    {"alias": "Grace Hopper", "entity_id": "ent:grace_hopper", "canonical": "Grace Hopper", "tnnt_label": "tnnt:Person", "prior": 0.95},
    {"alias": "G. Hopper", "entity_id": "ent:grace_hopper", "canonical": "Grace Hopper", "tnnt_label": "tnnt:Person", "prior": 0.70},
    {"alias": "Alan Turing", "entity_id": "ent:alan_turing", "canonical": "Alan Turing", "tnnt_label": "tnnt:Person", "prior": 0.95},
    {"alias": "Ada Lovelace", "entity_id": "ent:ada_lovelace", "canonical": "Ada Lovelace", "tnnt_label": "tnnt:Person", "prior": 0.95},
    {"alias": "Margaret Hamilton", "entity_id": "ent:margaret_hamilton", "canonical": "Margaret Hamilton", "tnnt_label": "tnnt:Person", "prior": 0.90},
    # ambiguous alias: film director vs software pioneer
    {"alias": "Margaret Hamilton", "entity_id": "ent:margaret_hamilton_actress", "canonical": "Margaret Hamilton (actress)", "tnnt_label": "tnnt:Person", "prior": 0.40},
    {"alias": "Apache Software Foundation", "entity_id": "ent:asf", "canonical": "Apache Software Foundation", "tnnt_label": "tnnt:Organisation", "prior": 0.95},
    {"alias": "Apache", "entity_id": "ent:asf", "canonical": "Apache Software Foundation", "tnnt_label": "tnnt:Organisation", "prior": 0.60},
    {"alias": "Apache", "entity_id": "ent:apache_helicopter", "canonical": "AH-64 Apache", "tnnt_label": "tnnt:Misc", "prior": 0.30},
    {"alias": "Mozilla", "entity_id": "ent:mozilla", "canonical": "Mozilla Foundation", "tnnt_label": "tnnt:Organisation", "prior": 0.90},
    {"alias": "CSIRO", "entity_id": "ent:csiro", "canonical": "CSIRO", "tnnt_label": "tnnt:Organisation", "prior": 0.95},
    {"alias": "Canberra", "entity_id": "ent:canberra", "canonical": "Canberra", "tnnt_label": "tnnt:GPE", "prior": 0.95},
    {"alias": "Sydney", "entity_id": "ent:sydney", "canonical": "Sydney", "tnnt_label": "tnnt:GPE", "prior": 0.95},
    {"alias": "Zurich", "entity_id": "ent:zurich", "canonical": "Zurich", "tnnt_label": "tnnt:GPE", "prior": 0.95},
    {"alias": "Apache License", "entity_id": "ent:apache_license", "canonical": "Apache License 2.0", "tnnt_label": "tnnt:Law", "prior": 0.9},
    {"alias": "MIT License", "entity_id": "ent:mit_license", "canonical": "MIT License", "tnnt_label": "tnnt:Law", "prior": 0.9},
    {"alias": "Python", "entity_id": "ent:python_lang", "canonical": "Python (programming language)", "tnnt_label": "tnnt:Language", "prior": 0.9},
    {"alias": "Java", "entity_id": "ent:java_lang", "canonical": "Java (programming language)", "tnnt_label": "tnnt:Language", "prior": 0.9},
    {"alias": "Unicode", "entity_id": "ent:unicode", "canonical": "Unicode", "tnnt_label": "tnnt:Misc", "prior": 0.9},
]
