"""Per-language structural metadata extractors — the source-code-payload
analogue of the reference's format-specific extractors
(File.extract{PDF,DOCX,...}info, code/MEL/__init__.py:1167-2013) with
the same dispatch shape (extract_ext_info dynamic dispatch,
code/MEL/__init__.py:2016-2022; Extension-Mappings config).

Each "extractor" contributes the structural fields a code file has in
place of a PDF's pages/fonts: comment lines, docstrings, imports,
function definitions, string literals, identifiers. Dispatch is a
when/otherwise chain on the `extractor` column (J3), each branch a
literal-regex expression — all JVM-side, codegen-compiled, one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# extractor name -> (comment regex, import regex, def regex)
_LANG_PATTERNS: dict[str, tuple[str, str, str]] = {
    "PYTHON": (r"(?m)^\s*#[^\n]*", r"(?m)^\s*(?:import|from)\s+[\w.]+", r"(?m)^\s*def\s+\w+"),
    "JAVA": (r"(?m)//[^\n]*", r"(?m)^\s*import\s+[\w.]+;", r"(?m)\b(?:public|private|protected)?\s*\w+\s+\w+\s*\("),
    "JS": (r"(?m)//[^\n]*", r"(?m)^\s*(?:import\s.+|const\s+\w+\s*=\s*require\()", r"(?m)\bfunction\s+\w+"),
    "GO": (r"(?m)//[^\n]*", r"(?m)^\s*import\s", r"(?m)^func\s+\w+"),
    "RUST": (r"(?m)//[^\n]*", r"(?m)^\s*use\s+[\w:]+", r"(?m)\bfn\s+\w+"),
    "MARKDOWN": (r"(?m)^>[^\n]*", r"\[[^\]]*\]\([^)]*\)", r"(?m)^#{1,6}\s[^\n]*"),
}

_DOCSTRING = r'"""[\s\S]*?"""'
# non-empty literals only: '' artifacts inside triple-quote docstrings
# would otherwise inflate the count
_STRING_LIT = r"'[^'\n]+'|\"[^\"\n]+\""
_IDENTIFIER = r"[A-Za-z_][A-Za-z0-9_]{2,}"


def _count(col: str, pattern: str) -> Column:
    esc = pattern.replace("\\", "\\\\").replace("'", "\\'")
    return F.size(F.expr(f"regexp_extract_all({col}, '{esc}', 0)")).cast("long")


def _dispatch(extractor_col: Column, content_col: str, idx: int) -> Column:
    """J3 dispatch: pick the idx-th pattern for the row's extractor."""
    expr = F.lit(0).cast("long")
    for name, pats in _LANG_PATTERNS.items():
        expr = F.when(extractor_col == name, _count(content_col, pats[idx])).otherwise(expr)
    return expr


def with_structural_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Adds the structural-metadata struct. Expects an `extractor`
    column (from metadata.with_general_metadata)."""
    ext = F.col("extractor")
    return df.withColumn(
        "structural",
        F.struct(
            _dispatch(ext, content_col, 0).alias("n_comments"),
            _dispatch(ext, content_col, 1).alias("n_imports"),
            _dispatch(ext, content_col, 2).alias("n_defs"),
            _count(content_col, _DOCSTRING).alias("n_docstrings"),
            _count(content_col, _STRING_LIT).alias("n_string_literals"),
            _count(content_col, _IDENTIFIER).alias("n_identifiers"),
            F.size(F.split(F.col(content_col), "\n")).cast("long").alias("n_lines"),
        ),
    )


def csv_cells(df: DataFrame, id_col: str, clean_text_col: str) -> DataFrame:
    """F4/A14 — the reference's CSV path: csv_preprocess splits the
    clean text into cells, NER runs per cell, results merge per doc
    (NER.csv_preprocess, code/NLP_NER/EntityRecognition.py:793-801;
    get_csv_ner_from_models, 935-992). Relationally: posexplode the
    cell list; downstream detectors run per cell row and groupBy(doc)
    merges — no bespoke merge operator needed."""
    cells = F.split(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(clean_text_col), r"[\-()<=>~`|{}@#?!&$]+ *", " "),
                r"\n",
                ",",
            ),
            r"[\p{Cc}\p{Cs}]",
            "",
        ),
        ",",
    )
    return df.select(
        F.col(id_col), F.posexplode(cells).alias("cell_index", "cell_text")
    )
