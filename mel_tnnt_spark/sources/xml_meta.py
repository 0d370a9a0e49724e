"""S13 — XML metadata-file reader.

The reference parses NLNZ Metadata Extractor XML sidecar files into
JSON metadata and keeps them only when the XML's ABSOLUTEPATH field
matches the actual file path (File.extractMetadata,
code/MEL/__init__.py:1122-1143; xmljson.parker conversion).

Spark-first design: `F.from_xml` (Spark 4 built-in, JVM-side — no
Python hop) parses the sidecar column against a declared schema; the
path-correspondence guard becomes a codegen'd boolean. Malformed XML
yields NULL structs (PERMISSIVE mode), mirroring the reference's
"parse failure -> empty metadata dict" behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The subset of NLNZ General-Metadata the pipeline consumes. Extend the
# DDL when more fields matter; unknown XML elements are simply ignored
# by from_xml (same effect as the reference's field-wise copy).
NLNZ_GENERAL_SCHEMA = (
    "METADATA struct<ABSOLUTEPATH: string, FILELENGTH: bigint, MIMETYPE: string>"
)


def parse_metadata_xml(
    df: DataFrame,
    xml_col: str = "metadata_xml",
    path_col: str = "abs_path",
    win_prefix: str = "\\\\?\\",
) -> DataFrame:
    """Parse the sidecar XML and apply the reference's correspondence
    check: metadata counts only if its ABSOLUTEPATH equals the row's
    actual path (same-filename-different-folder guard), tolerating the
    extended-Windows-path prefix on either side
    (code/MEL/__init__.py:1135-1143).

    Adds:
      meta          struct(ABSOLUTEPATH, FILELENGTH, MIMETYPE) or NULL
      meta_read_ok  boolean — parsed AND path-correspondent
    """
    parsed = F.from_xml(F.col(xml_col), NLNZ_GENERAL_SCHEMA)
    meta = parsed["METADATA"]
    norm = _strip_prefix(meta["ABSOLUTEPATH"], win_prefix)
    ok = meta.isNotNull() & (norm == _strip_prefix(F.col(path_col), win_prefix))
    return df.withColumn("meta", meta).withColumn(
        "meta_read_ok", F.coalesce(ok, F.lit(False))
    )


def _strip_prefix(col: Column, prefix: str) -> Column:
    n = len(prefix)
    return F.when(
        col.substr(1, n) == F.lit(prefix), col.substr(F.lit(n + 1), F.length(col))
    ).otherwise(col)
