"""XLSX associated-metadata source — a REAL pure-python reader.

The reference loads its associated-metadata tables (species lists,
conservation statuses) from XLSX sheets into arrays and binary-searches
them per file (AssociatedMetadata, code/MEL/__init__.py:828-916, via
openpyxl; sheet wiring code/MEL/DoEE_Species.py:25-120). No XLSX
library ships in this container, but .xlsx is a ZIP of XML parts, so
the reader here parses the OOXML SpreadsheetML structure directly with
stdlib zipfile + ElementTree: sharedStrings.xml for the string table,
xl/worksheets/sheet*.xml for cells (shared / inline / numeric cell
types, ragged rows padded). Original implementation against the public
ECMA-376 format — no reference code involved.

The loaded sheet becomes the broadcast dim of the J1/J2 lookup joins
(operators/linking.lookup_with_fallback), with the reference's typed
casts ("str" | "int" | "float", AssociatedMetadata.cast,
code/MEL/__init__.py:842-851) applied per column.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"^([A-Z]+)\d*$")


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'B7' -> 1, 'AA3' -> 26 (base-26 letters prefix)."""
    m = _COL_RE.match(cell_ref or "")
    if not m:
        return 0
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def py_read_xlsx(payload: bytes, sheet_index: int = 0) -> list[list[str | None]]:
    """Parse one worksheet into a list of rows (cell values as strings,
    None for absent cells; rows padded to the widest row seen)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheets = sorted(
            n for n in names
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        )
        if not sheets:
            raise ValueError("no worksheets in xlsx payload")
        root = ET.fromstring(z.read(sheets[sheet_index]))
        rows: list[dict[int, str]] = []
        for row in root.iter(f"{_NS}row"):
            cells: dict[int, str] = {}
            for pos, c in enumerate(row.findall(f"{_NS}c")):
                col = _col_index(c.get("r") or "") if c.get("r") else pos
                t = c.get("t")
                if t == "inlineStr":
                    v: str | None = "".join(tt.text or "" for tt in c.iter(f"{_NS}t"))
                else:
                    ve = c.find(f"{_NS}v")
                    v = ve.text if ve is not None else None
                    if t == "s" and v is not None:
                        v = shared[int(v)]
                if v is not None:
                    cells[col] = v
            rows.append(cells)
    width = max((max(r) + 1 for r in rows if r), default=0)
    return [[r.get(i) for i in range(width)] for r in rows]


def _cast_col(col, kind: str):
    """The reference's typed-search casts (code/MEL/__init__.py:842-851)."""
    if kind == "int":
        return col.cast("long")
    if kind == "float":
        return col.cast("double")
    return col  # "str"


def read_xlsx_dim(
    spark: SparkSession,
    payload: bytes,
    types: dict[str, str] | None = None,
    sheet_index: int = 0,
) -> DataFrame:
    """Worksheet -> broadcast-sized dim DataFrame: first row = header,
    remaining rows = data, per-column casts from `types`
    ({column: 'str'|'int'|'float'}). Single-partition by construction
    (dims must not inherit defaultParallelism — see linking.py)."""
    rows = py_read_xlsx(payload, sheet_index)
    if not rows:
        raise ValueError("empty worksheet")
    header = [h if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    from mel_tnnt_spark.session import local_dim

    df = local_dim(
        spark, [tuple(r) for r in rows[1:]], ", ".join(f"`{h}` string" for h in header)
    )
    for col, kind in (types or {}).items():
        if col in header:
            df = df.withColumn(col, _cast_col(F.col(col), kind))
    return df
