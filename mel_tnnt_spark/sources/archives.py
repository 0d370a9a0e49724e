"""M14 — document + attachment/archive expansion.

The reference runs NER over doc-0 = the main text plus doc-i = each
MSG attachment / archive member (ner_for_all_files,
code/NLP_NER/EntityRecognition.py:1055-1093; attachment texts
900-915). The engine's source rows are already file-granular, so the
remaining case is container files: a row whose payload is an archive
expands into one row per member.

Spark-first shape: mapInPandas over (key cols, payload:binary) Arrow
batches; stdlib zipfile/tarfile/gzip decode member bytes in-memory (no
temp files, no driver involvement). Non-archive rows pass through as
member_index 0 with the original payload — exactly the reference's
doc-0 convention — so the operator is a total function over any mixed
corpus and downstream stages need no special-casing.

Scale notes: one archive = one unit of work; a giant archive is a
straggler exactly like a giant document, and the same mitigation
applies (repartition by key first so archives spread across tasks; the
per-member output is exploded immediately so downstream stages
repartition freely). Task memory is bounded by a byte-threshold flush:
member rows stream out whenever the buffer exceeds it, so a giant
archive flushes alone while small pass-through rows batch together
(per-row emission would pay one Arrow batch per document).
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("container", StringType(), False),  # zip|tar|gzip|none
        StructField("member_index", IntegerType(), False),
        StructField("member_path", StringType(), True),
        StructField("member_content", BinaryType(), True),
    ]
)


def sniff_container(payload: bytes | None) -> str:
    """Magic-byte sniff, mirroring the reference's MIME-driven dispatch
    (MEL routes by detected type, not extension)."""
    if not payload:
        return "none"
    if payload[:4] == b"PK\x03\x04":
        return "zip"
    if payload[:2] == b"\x1f\x8b":
        return "gzip"
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "tar"
    return "none"


def py_explode_members(payload: bytes | None) -> list[tuple[str, int, str | None, bytes | None]]:
    """(container, member_index, member_path, member_content) rows for
    one payload. doc-0 convention: non-archives yield themselves;
    corrupt archives degrade to 'none' pass-through (the reference
    ignores unreadable attachments rather than failing the document)."""
    kind = sniff_container(payload)
    try:
        if kind == "zip":
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                return [
                    (kind, i, info.filename, zf.read(info))
                    for i, info in enumerate(zf.infolist())
                    if not info.is_dir()
                ]
        if kind == "tar":
            with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
                out = []
                for i, info in enumerate(tf.getmembers()):
                    if info.isfile():
                        f = tf.extractfile(info)
                        out.append((kind, i, info.name, f.read() if f else None))
                return out
        if kind == "gzip":
            return [("gzip", 0, None, gzip.decompress(payload))]
    except (zipfile.BadZipFile, tarfile.TarError, OSError, EOFError):
        pass
    return [("none", 0, None, payload)]


def explode_archive_members(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """One row per archive member (plus pass-through rows for plain
    payloads). Only (id, payload) cross the Arrow boundary."""
    narrow = df.select(id_col, payload_col)

    cols = [f.name for f in MEMBER_SCHEMA.fields]
    # flush threshold bounds task memory to ~one batch of member bytes;
    # a giant archive still flushes alone rather than queueing behind
    # pass-through rows
    flush_bytes = 64 << 20

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            pending = 0
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                for kind, idx, path, content in py_explode_members(raw):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "container": kind,
                            "member_index": idx,
                            "member_path": path,
                            "member_content": content,
                        }
                    )
                    pending += len(content) if content else 0
                if pending >= flush_bytes:
                    yield pd.DataFrame(rows, columns=cols)
                    rows, pending = [], 0
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return narrow.mapInPandas(run, MEMBER_SCHEMA)
