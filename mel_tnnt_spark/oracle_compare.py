"""THE oracle-compare contract — one definition of "the Spark result
matches the DuckDB oracle", shared by the builder-local parity test
(tests/test_oracle_parity.py), the adversarial fuzz gate
(tests/test_oracle_fuzz.py), and the committed correctness artifact
generator (scripts/local_correctness.py).

Previously three drifting copies (round-4 review find): a rounding or
null-ordering change in one gate but not the others would have made
the artifact and the tests disagree about what "green" means.

Semantics (mirrors the driver's gate):
- columns compared sorted by NAME (the driver sorts before hashing —
  which is why every gate aliases aggregates identically on both
  sides);
- floats rounded to 9 decimals; NaN and None both -> None; numpy
  scalars unwrapped;
- rows compared order-insensitively with a null-aware sort key.
"""

from __future__ import annotations

import math

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str, file_glob: bool = False, tables=TABLES):
    """DuckDB connection with one view per parquet table. file_glob=True
    for Spark-WRITTEN datasets (directories of part files) as the fuzz
    corpus uses; False for the driver's single-file testdata."""
    import duckdb

    con = duckdb.connect()
    suffix = "/*.parquet" if file_glob else ""
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet{suffix}'")
    return con


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, float):
        return round(v, 9)
    return v


def normalize(df):
    """(sorted column names, null-aware-sorted normalized row tuples)
    for a pandas DataFrame."""
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))
